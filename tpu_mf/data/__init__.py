from tpu_mf.data.coo import RatingsCOO, synthetic_ratings  # noqa: F401
