"""Pure-function compute kernels (geometry, solvers, matching, features, stereo).

Everything here is jit/vmap-friendly: fixed shapes, masks instead of dynamic
sizes, no Python control flow on traced values.
"""
