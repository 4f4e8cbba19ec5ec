"""Ray Data stage layer: vectorized stateless batch fns + actor classes.

Every stage is ``pyarrow.Table`` → ``pyarrow.Table``
(``batch_format='pyarrow'``, zero-copy from the object store) unless a
kernel genuinely needs pandas/numpy.
"""
