from .images import tensor2im, save_image, mkdirs, mkdir
from .metrics import compute_rand_f_scores

__all__ = ["tensor2im", "save_image", "mkdirs", "mkdir",
           "compute_rand_f_scores"]
