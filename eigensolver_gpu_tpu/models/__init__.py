"""Solver pipelines (the framework's 'model' layer).

models/sygvdx.py  -- generalized drivers (reference L3: dsygvdx_gpu.F90,
                     zhegvdx_gpu.F90)
models/syevdx.py  -- standard drivers (reference L2 entry: dsyevd_gpu.F90,
                     zheevd_gpu.F90), self-contained (unlike the
                     reference's 'works if called from zhegvd only!'
                     lower-triangle stash, zheevd_gpu.F90:88-96)
"""
