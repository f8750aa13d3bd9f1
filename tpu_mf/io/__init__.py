from tpu_mf.io.checkpoint import (  # noqa: F401
    save_mf_binary,
    load_mf_binary,
    save_dpmf_binary,
    load_dpmf_binary,
    load_dpmf_hyper,
    save_npz,
    load_npz,
)
