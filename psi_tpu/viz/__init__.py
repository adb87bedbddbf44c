from psi_tpu.viz.render import project_points, render_depth_semantics, upsample_mesh
from psi_tpu.viz.sphere import icosphere, points_to_spheres
from psi_tpu.viz.colors import mpcat40_color, BODY_COLORS

__all__ = [
    "project_points",
    "render_depth_semantics",
    "upsample_mesh",
    "icosphere",
    "points_to_spheres",
    "mpcat40_color",
    "BODY_COLORS",
]
