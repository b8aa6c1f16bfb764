from opticalflowhs_tpu.io.flo import read_flo, write_flo
from opticalflowhs_tpu.io.images import load_gray, save_image

__all__ = ["read_flo", "write_flo", "load_gray", "save_image"]
