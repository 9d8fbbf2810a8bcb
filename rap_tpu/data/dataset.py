"""Multi-part point-cloud dataset: HDF5 / PLY-folder storage + augmentation.

Storage-format parity with /root/reference/rectified_point_flow/data/dataset.py
so existing preprocessed datasets drop in unchanged:

  - folder layout: `<root>/data_split/{split}[_random].txt` lists fragment
    dirs; each `<root>/<frag>/` holds `*.ply` parts with optional
    `features_<part>.npy` sidecars; optional `<root>/num_points/{split}.txt`
    (dataset.py:462-553).
  - HDF5 layout: `h5["data_split"][dataset][split]` holds fragment names;
    `h5[<frag>][<part>]["vertices"|"features"]`; optional
    `h5["num_points"][dataset][split]` (dataset.py:555-641). SWMR read-only
    handles, reopened per worker thread.
  - split fallback: requested split type (standard/random) falls back to the
    other when missing/empty, consistently across splits (dataset.py:122-251).
  - augmentation (`Sample.transform`, label contract of dataset.py:733-900):
    center on the largest ("primary") part, global random rotation (train),
    scale = 1.5 * max|coord| of the rotated primary part (x random factor),
    per-part re-centering + independent random rotation + point shuffle;
    anchor part keeps identity rotation and translation -gt_trans; invariant
    `points @ R^T + t == points_gt` per part.

TPU-first divergence: the output is per-part numpy arrays (a `Sample`), not a
packed tensor — the packer (data/packer.py) turns lists of Samples into
fixed-shape PartBatches. RNG is an explicit per-sample np.random.Generator
(seeded from epoch/index) instead of global state.
"""

from __future__ import annotations

import dataclasses
import glob
import logging
import os
from pathlib import Path

import numpy as np
from scipy.spatial.transform import Rotation

logger = logging.getLogger("rap_tpu.data")

FEAT_DIM_DEFAULT = 32


# --------------------------------------------------------------------------
# Sample container + augmentation
# --------------------------------------------------------------------------

@dataclasses.dataclass
class Sample:
    """One multi-part sample after augmentation (all in scaled space)."""

    name: str
    dataset_name: str
    index: int
    points: list[np.ndarray]        # per part (Ni, 3) — condition (augmented)
    points_gt: list[np.ndarray]     # per part (Ni, 3) — registered GT
    features: list[np.ndarray]      # per part (Ni, F)
    rotations: np.ndarray           # (P, 3, 3) — points @ R^T + t == points_gt
    translations: np.ndarray        # (P, 3)
    anchor_idx: int
    scale: float
    global_rotation: np.ndarray     # (3, 3)
    global_translation: np.ndarray  # (3,)
    # per-dataset overlap threshold, carried as sample metadata exactly like
    # the reference's sample dict (ref dataset.py:656,671; never consumed by
    # the released runtime — reserved for overlap-probability models)
    overlap_threshold: float = 0.0
    # surface normals, rotated alongside the coordinates through the full
    # augmentation (ref dataset.py:746-800 pointclouds_normals[_gt]); None
    # when the source dataset carries no normals. Unit vectors: rotation
    # applies, centering/scale do not. Not consumed by the model — storage
    # parity for datasets that have them (ref io_utils.py:601-919).
    normals: list[np.ndarray] | None = None     # per part (Ni, 3) — condition frame
    normals_gt: list[np.ndarray] | None = None  # per part (Ni, 3) — GT frame

    @property
    def num_parts(self) -> int:
        return len(self.points)

    @property
    def total_points(self) -> int:
        return sum(len(p) for p in self.points)

    @property
    def max_part_points(self) -> int:
        return max(len(p) for p in self.points)


def _random_rotation(rng: np.random.Generator) -> np.ndarray:
    return Rotation.random(random_state=rng).as_matrix()


def _random_yaw_rotation(
    rng: np.random.Generator, roll_pitch_range: float
) -> np.ndarray:
    """Yaw U(-180,180) around z with roll/pitch perturbations (ref
    transform.py:66-104): R = from_euler('zxy', [yaw, roll, pitch])."""
    yaw = rng.uniform(-180.0, 180.0)
    roll = rng.uniform(-roll_pitch_range, roll_pitch_range)
    pitch = rng.uniform(-roll_pitch_range, roll_pitch_range)
    return Rotation.from_euler(
        "zxy", np.radians([yaw, roll, pitch])
    ).as_matrix()


def augment_sample(
    name: str,
    dataset_name: str,
    index: int,
    parts_gt: list[np.ndarray],
    features: list[np.ndarray] | None,
    rng: np.random.Generator,
    train: bool,
    normals: list[np.ndarray] | None = None,
    yaw_augmentation: bool = False,
    roll_pitch_range: float = 5.0,
    random_scale_range: tuple[float, float] | None = None,
    feat_dim: int = FEAT_DIM_DEFAULT,
    overlap_threshold: float = 0.0,
    rotate_global: bool = True,
    rotate_parts: bool = True,
) -> Sample:
    """Apply the scaling/rotation/centering/shuffle label contract.

    ``rotate_global`` / ``rotate_parts`` (only consulted when ``train``)
    decompose the augmentation for protocol diagnostics: the eval-protocol
    study (docs/synthetic_training.md) needs to attribute rotated-vs-
    unrotated recall differences to the scene frame (global rotation) vs
    the per-part pose posterior (part rotations) separately."""
    n_parts = len(parts_gt)
    counts = np.array([len(p) for p in parts_gt])
    primary = int(np.argmax(counts))
    all_gt = np.concatenate(parts_gt).astype(np.float64)
    tran_global = all_gt.mean(0)

    # global frame: center on the primary part, rotate (train only)
    primary_center = parts_gt[primary].mean(0)
    if train:
        # always consume the draw so the RNG stream (and thus the part
        # rotations below) is identical across the decomposition modes
        R_draw = (
            _random_yaw_rotation(rng, roll_pitch_range)
            if yaw_augmentation
            else _random_rotation(rng)
        )
        R_fwd = R_draw if rotate_global else np.eye(3)
    else:
        R_fwd = np.eye(3)
    rot_global = R_fwd.T  # stored inverse, as in the reference

    primary_rotated = (parts_gt[primary] - primary_center) @ R_fwd.T
    scale = float(np.max(np.abs(primary_rotated))) * 1.5
    if train and random_scale_range is not None:
        scale *= rng.uniform(*random_scale_range)
    scale = max(scale, 1e-12)

    gt_parts = [
        ((p - primary_center) @ R_fwd.T) / scale for p in parts_gt
    ]
    gt_trans = np.concatenate(gt_parts).mean(0)
    gt_parts = [p - gt_trans for p in gt_parts]

    # normals ride the same rotations as the coordinates (ref
    # dataset.py:770-809 passes normals through rotate_pcd[_yaw]); scale and
    # centering leave unit vectors untouched
    gt_normals = (
        None if normals is None else [np.asarray(n) @ R_fwd.T for n in normals]
    )

    out_pts: list[np.ndarray] = []
    out_gt: list[np.ndarray] = []
    out_feats: list[np.ndarray] = []
    out_nrm: list[np.ndarray] = []
    out_nrm_gt: list[np.ndarray] = []
    rots = np.zeros((n_parts, 3, 3), np.float32)
    trans = np.zeros((n_parts, 3), np.float32)
    for i in range(n_parts):
        gt_i = gt_parts[i]
        center = gt_i.mean(0)
        if i == primary:
            # anchor: identity rotation, translation -gt_trans; the condition
            # cloud is the GT shifted back by gt_trans (ref dataset.py:857-867)
            R_aug = np.eye(3)
            cond = gt_i + gt_trans
            rots[i] = np.eye(3)
            trans[i] = -gt_trans
        else:
            # per-part rotation follows the SAME regime as the global one:
            # the reference applies rotate_pcd_yaw to each part when
            # yaw_augmentation is set (ref dataset.py:808-809) — yaw-only
            # with small roll/pitch, NOT full SO(3)
            if not train:
                R_part = np.eye(3)
            else:
                R_part = (
                    _random_yaw_rotation(rng, roll_pitch_range)
                    if yaw_augmentation
                    else _random_rotation(rng)
                )
                if not rotate_parts:
                    R_part = np.eye(3)  # draw consumed; stream stays aligned
            cond = (gt_i - center) @ R_part.T
            # pose invariant cond @ R^T + t == gt:
            # cond = (gt - c) @ R_part^T  =>  gt = cond @ R_part + c, so
            # R^T = R_part => R = R_part^T, t = c.
            rots[i] = np.asarray(R_part).T
            trans[i] = center
        order = rng.permutation(len(gt_i))
        out_pts.append(cond[order].astype(np.float32))
        out_gt.append(gt_i[order].astype(np.float32))
        if gt_normals is not None:
            n_gt_i = gt_normals[i]
            # condition-frame normals obey the pose invariant
            # normals @ R^T == normals_gt, i.e. n_cond = n_gt @ R
            n_cond = n_gt_i @ rots[i]
            out_nrm.append(n_cond[order].astype(np.float32))
            out_nrm_gt.append(n_gt_i[order].astype(np.float32))
        if features is not None and features[i] is not None:
            out_feats.append(np.asarray(features[i])[order].astype(np.float32))
        else:
            out_feats.append(np.zeros((len(gt_i), feat_dim), np.float32))

    return Sample(
        name=name,
        dataset_name=dataset_name,
        index=index,
        points=out_pts,
        points_gt=out_gt,
        features=out_feats,
        rotations=rots,
        translations=trans,
        anchor_idx=primary,
        scale=scale,
        global_rotation=rot_global.astype(np.float32),
        global_translation=tran_global.astype(np.float32),
        overlap_threshold=overlap_threshold,
        normals=out_nrm if gt_normals is not None else None,
        normals_gt=out_nrm_gt if gt_normals is not None else None,
    )


# --------------------------------------------------------------------------
# Dataset
# --------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class DatasetConfig:
    data_path: str = ""
    dataset_name: str = "dataset"
    split: str = "val"
    min_parts: int = 2
    max_parts: int = 64
    min_points_per_part: int = 0
    limit_val_samples: int = 0
    use_random_split: bool = False
    load_features: bool = True
    feat_dim: int = FEAT_DIM_DEFAULT
    yaw_augmentation: bool = False
    roll_pitch_range: float = 5.0
    random_scale_range: tuple[float, float] | None = None
    overlap_threshold: float = 0.0
    seed: int = 0
    # force train-style random rotations on a val/test split (deterministic
    # per-index seeds). The reference evaluates with identity augmentation
    # (dataset.py:770-773 train-only rotations); this extension exists so a
    # model's rotation robustness can be measured honestly on held-out data
    # instead of only under the identity-pose protocol.
    augment_eval: bool = False
    # decomposition of augment_eval for protocol diagnostics:
    #   "full"        — global + per-part rotations (train-style, default)
    #   "global_only" — rotate the scene frame, parts stay at GT orientation
    #   "parts_only"  — scene frame stays canonical, parts get rotations
    # Used to attribute rotated-vs-unrotated recall differences (the run-8
    # inversion, docs/synthetic_training.md) to one of the two mechanisms.
    augment_eval_mode: str = "full"


class PointCloudDataset:
    """Loads fragments from a PLY folder or an HDF5 file and augments them."""

    def __init__(self, cfg: DatasetConfig):
        self.cfg = cfg
        self.data_path = cfg.data_path
        self.use_folder = os.path.isdir(cfg.data_path)
        self._h5 = None
        self.effective_random = self._determine_split_type()
        self.fragments, self.part_counts, self.precomputed_num_points = (
            self._build_fragment_list()
        )

    # ---- split handling ----------------------------------------------------
    def _split_file(self, split: str, random_split: bool) -> Path:
        suffix = "_random" if random_split else ""
        return Path(self.data_path) / "data_split" / f"{split}{suffix}.txt"

    def _folder_split_available(self, random_split: bool) -> bool:
        return all(
            self._split_file(s, random_split).is_file()
            and self._split_file(s, random_split).stat().st_size > 0
            for s in ("train", "val")
        )

    def _h5_split_available(self, random_split: bool) -> bool:
        h5 = self._get_h5()
        ds = self.cfg.dataset_name
        if "data_split" not in h5 or ds not in h5["data_split"]:
            return False
        suffix = "_random" if random_split else ""
        return all(f"{s}{suffix}" in h5["data_split"][ds] for s in ("train", "val"))

    def _determine_split_type(self) -> bool:
        """True => use random splits; mirrors the bidirectional fallback."""
        avail = (
            self._folder_split_available
            if self.use_folder
            else self._h5_split_available
        )
        preferred = self.cfg.use_random_split
        if avail(preferred):
            return preferred
        if avail(not preferred):
            logger.info(
                "%s splits unavailable for %s; falling back to %s",
                "random" if preferred else "standard",
                self.data_path,
                "standard" if preferred else "random",
            )
            return not preferred
        return False

    # ---- fragment list -----------------------------------------------------
    def _get_h5(self):
        import h5py

        if self._h5 is None:
            self._h5 = h5py.File(self.data_path, "r", libver="latest", swmr=True)
        return self._h5

    def _build_fragment_list(self):
        cfg = self.cfg
        split_key = cfg.split + ("_random" if self.effective_random else "")
        if self.use_folder:
            sf = self._split_file(cfg.split, self.effective_random)
            if not sf.is_file() or sf.stat().st_size == 0:
                alt = self._split_file(cfg.split, not self.effective_random)
                if alt.is_file() and alt.stat().st_size > 0:
                    sf = alt
                    split_key = cfg.split + (
                        "" if self.effective_random else "_random"
                    )
                else:
                    logger.error("no split file for %s in %s", cfg.split, self.data_path)
                    return [], [], []
            frags = [l.strip() for l in sf.read_text().splitlines() if l.strip()]
            npf = Path(self.data_path) / "num_points" / f"{split_key}.txt"
            if npf.is_file():
                num_points = [int(l) for l in npf.read_text().split()]
            else:
                num_points = [0] * len(frags)
            if len(num_points) != len(frags):
                # a stale num_points file must not silently drop fragments
                # through zip truncation — fall back to unknown sizes
                logger.warning(
                    "num_points/%s.txt has %d entries for %d fragments; "
                    "ignoring it", split_key, len(num_points), len(frags),
                )
                num_points = [0] * len(frags)
            kept, counts, npts = [], [], []
            for frag, npnt in zip(frags, num_points):
                n = len(glob.glob(os.path.join(self.data_path, frag, "*.ply")))
                if cfg.min_parts <= n <= cfg.max_parts:
                    kept.append(frag)
                    counts.append(n)
                    npts.append(npnt)
        else:
            h5 = self._get_h5()
            ds = cfg.dataset_name
            try:
                raw = h5["data_split"][ds][split_key]
            except KeyError:
                alt_key = cfg.split + ("" if self.effective_random else "_random")
                try:
                    raw = h5["data_split"][ds][alt_key]
                except KeyError:
                    # match the folder branch's graceful degradation instead
                    # of an opaque h5py KeyError
                    logger.error(
                        "no split '%s' (or '%s') for dataset %s in %s",
                        split_key, alt_key, ds, self.data_path,
                    )
                    return [], [], []
                split_key = alt_key
            frags = [r.decode() if isinstance(r, bytes) else str(r) for r in raw[:]]
            if "num_points" in h5 and ds in h5["num_points"] and split_key in h5["num_points"][ds]:
                num_points = list(h5["num_points"][ds][split_key][:])
            else:
                num_points = [0] * len(frags)
            if len(num_points) != len(frags):
                logger.warning(
                    "h5 num_points[%s][%s] has %d entries for %d fragments; "
                    "ignoring it", ds, split_key, len(num_points), len(frags),
                )
                num_points = [0] * len(frags)
            kept, counts, npts = [], [], []
            for frag, npnt in zip(frags, num_points):
                try:
                    n = len(h5[frag].keys())
                except KeyError:
                    continue
                if cfg.min_parts <= n <= cfg.max_parts:
                    kept.append(frag)
                    counts.append(n)
                    npts.append(int(npnt))

        if (
            cfg.limit_val_samples > 0
            and len(kept) > cfg.limit_val_samples
            and cfg.split.startswith("val")
        ):
            # stride for spread, then truncate: len(kept[::step]) can exceed
            # the limit (e.g. 10 of 7 wanted from 70), so cap it explicitly
            step = len(kept) // cfg.limit_val_samples
            kept = kept[::step][: cfg.limit_val_samples]
            counts = counts[::step][: cfg.limit_val_samples]
            npts = npts[::step][: cfg.limit_val_samples]
        return kept, counts, npts

    def __len__(self) -> int:
        return len(self.fragments)

    # ---- loading -------------------------------------------------------------
    def _load_parts(self, frag: str):
        from ..utils import ply as plyio

        parts_gt, feats, normals = [], [], []
        if self.use_folder:
            folder = os.path.join(self.data_path, frag)
            for ply_path in sorted(glob.glob(os.path.join(folder, "*.ply"))):
                data = plyio.read_ply(ply_path, read_faces=False)
                parts_gt.append(data["points"].astype(np.float64))
                normals.append(data.get("normals"))
                stem = os.path.splitext(os.path.basename(ply_path))[0]
                fpath = os.path.join(folder, f"features_{stem}.npy")
                feats.append(np.load(fpath) if os.path.exists(fpath) else None)
        else:
            group = self._get_h5()[frag]
            for part in sorted(group.keys()):
                sub = group[part]
                parts_gt.append(np.asarray(sub["vertices"][:], np.float64))
                normals.append(
                    np.asarray(sub["normals"][:]) if "normals" in sub else None
                )
                feats.append(
                    np.asarray(sub["features"][:]) if "features" in sub else None
                )
        # normals are all-or-nothing per sample (ref io_utils.py:601-919
        # writes them per part when present)
        if any(n is None for n in normals):
            normals = None
        if not self.cfg.load_features or any(f is None for f in feats):
            feats = None
        # drop under-populated parts (ref dataset.py:307 min_points_per_part):
        # tiny fragments destabilize Kabsch and the overlap metrics
        if self.cfg.min_points_per_part > 0:
            keep = [
                i for i, p in enumerate(parts_gt)
                if len(p) >= self.cfg.min_points_per_part
            ]
            if len(keep) < len(parts_gt):
                if len(keep) < self.cfg.min_parts:
                    logger.warning(
                        "%s: only %d/%d parts have >= %d points; keeping all",
                        frag, len(keep), len(parts_gt), self.cfg.min_points_per_part,
                    )
                else:
                    parts_gt = [parts_gt[i] for i in keep]
                    if feats is not None:
                        feats = [feats[i] for i in keep]
                    if normals is not None:
                        normals = [normals[i] for i in keep]
        return parts_gt, feats, normals

    def get(self, index: int, epoch: int = 0) -> Sample:
        frag = self.fragments[index]
        parts_gt, feats, normals = self._load_parts(frag)
        rng = np.random.default_rng(
            np.random.SeedSequence([self.cfg.seed, epoch, index])
        )
        is_train_split = self.cfg.split.startswith("train")
        mode = self.cfg.augment_eval_mode if (
            self.cfg.augment_eval and not is_train_split
        ) else "full"
        if mode not in ("full", "global_only", "parts_only"):
            raise ValueError(f"unknown augment_eval_mode: {mode!r}")
        return augment_sample(
            name=frag,
            dataset_name=self.cfg.dataset_name,
            index=index,
            parts_gt=parts_gt,
            features=feats,
            normals=normals,
            rng=rng,
            train=is_train_split or self.cfg.augment_eval,
            yaw_augmentation=self.cfg.yaw_augmentation,
            roll_pitch_range=self.cfg.roll_pitch_range,
            random_scale_range=self.cfg.random_scale_range,
            feat_dim=self.cfg.feat_dim,
            overlap_threshold=self.cfg.overlap_threshold,
            rotate_global=mode in ("full", "global_only"),
            rotate_parts=mode in ("full", "parts_only"),
        )

    def __getitem__(self, index: int) -> Sample:
        return self.get(index)

    def close(self):
        if self._h5 is not None:
            self._h5.close()
            self._h5 = None
