"""Image-processing compute kernels (ref: src/image_processor.cpp internals).

Pure-JAX reference implementations first (XLA already fuses these well on
TPU); the gather-heavy LK tracker has a Pallas specialization in lk_pallas.py.
"""
