"""Multi-chip sharding of the renderer and trainer.

The reference is a single-GPU program (SURVEY.md §2.3); this package is the
new capability BASELINE.json mandates: Gaussians sharded over a ``gauss``
mesh axis, image tile strips distributed across the same axis, camera
batches data-parallel over a ``data`` axis, with XLA collectives
(all_gather / psum / psum_scatter) riding ICI.
"""

from gsjax.parallel.mesh import make_mesh
from gsjax.parallel.shard import (
    make_sharded_render,
    make_sharded_train_step,
    shard_gaussian_state,
)

__all__ = [
    "make_mesh",
    "make_sharded_render",
    "make_sharded_train_step",
    "shard_gaussian_state",
]
from gsjax.parallel.multi_scene import (  # noqa: F401
    make_multi_scene_train_step,
    make_scene_mesh,
    stack_scene_states,
    unstack_scene_state,
)
