"""Full-scale multi-chip dryrun on the virtual 8-device CPU mesh.

Round-2 verdict weak #7: the driver dryrun validates sharding at toy
shapes (64px images, 256-vert bodies); a shape-dependent sharding bug
(uneven tile splits at 10475 verts, Morton-tile pruning one-hot widths,
128^3 SDF gather partitioning) would slip through. This test runs the
REAL shapes — SMPL-X-sized body, 128^3 grids, 20k-point clouds, the
full production fit config — sharded over 8 virtual devices and asserts
sharded == unsharded (reference scale: fitting_proxe.py:42-263 runs the
same shapes single-GPU, one body at a time).
"""

def test_dryrun_multichip_fullscale_8():
    import __graft_entry__ as g

    g.dryrun_multichip_fullscale(8)
