"""Pure, deterministic per-document kernels.

These modules import only the standard library / numpy — no Ray — so
they can be unit-tested directly and wrapped by ``stages/`` into
vectorized ``map_batches`` transforms.
"""
