"""Scene ingest: COLMAP / Blender readers, cameras, PLY interchange."""

from gsjax.data.cameras import Camera, RenderCamera
from gsjax.data.dataset_readers import (
    BasicPointCloud,
    SceneInfo,
    load_scene_info,
    read_colmap_scene,
    read_blender_scene,
)
from gsjax.data.ply import read_ply, write_ply

__all__ = [
    "Camera",
    "RenderCamera",
    "BasicPointCloud",
    "SceneInfo",
    "load_scene_info",
    "read_colmap_scene",
    "read_blender_scene",
    "read_ply",
    "write_ply",
]
