from . import ply
