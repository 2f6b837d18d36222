"""Gaussian scene state + adaptive density control."""

from gsjax.models.gaussians import (
    GaussianState,
    create_from_pcd,
    create_empty,
    activated,
    load_gaussian_ply,
    save_gaussian_ply,
    knn_mean_sq_dist,
)
from gsjax.models.densify import (
    DensifyConfig,
    densify_and_prune,
    reset_opacity,
    add_densification_stats,
)

__all__ = [
    "GaussianState",
    "create_from_pcd",
    "create_empty",
    "activated",
    "load_gaussian_ply",
    "save_gaussian_ply",
    "knn_mean_sq_dist",
    "DensifyConfig",
    "densify_and_prune",
    "reset_opacity",
    "add_densification_stats",
]
