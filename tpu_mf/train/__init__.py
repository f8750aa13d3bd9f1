from tpu_mf.train.loop import train_mf  # noqa: F401
