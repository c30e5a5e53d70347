from pyrapose_tpu.utils.precision import hdot, hmatmul, heinsum
