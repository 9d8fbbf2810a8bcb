from .model import (
    SpinNetConfig,
    init_spinnet_params,
    spinnet_forward,
    extract_features,
    build_feature_extractor,
    convert_spinnet_torch_state_dict,
)
