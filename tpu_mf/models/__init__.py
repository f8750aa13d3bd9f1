from tpu_mf.models.mf import MFParams, init_mf, predict, calc_mse, rmse  # noqa: F401
