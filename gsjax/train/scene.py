"""Scene container: dataset + model directory management.

The gsjax counterpart of the reference's ``Scene``
(reference: scene/__init__.py:25-92): loads the dataset, prepares the output
directory (cfg_args, cameras.json, input.ply copy), tracks the scene extent,
and saves PLY snapshots under ``point_cloud/iteration_<N>/``.
"""

from __future__ import annotations

import json
import os
import random
import shutil
from typing import List, Optional

from gsjax.configs import ModelParams
from gsjax.data.cameras import Camera
from gsjax.data.dataset_readers import (
    SceneInfo,
    camera_to_json,
    load_camera_images,
    load_scene_info,
)
from gsjax.models.gaussians import (
    GaussianState,
    create_from_pcd,
    load_gaussian_ply,
    save_gaussian_ply,
)
from gsjax.utils.system import search_for_max_iteration


class Scene:
    def __init__(
        self,
        model: ModelParams,
        load_iteration: Optional[int] = None,
        shuffle: bool = True,
        resolution_scales=(1.0,),
        load_images: bool = True,
        capacity: Optional[int] = None,
    ):
        self.model_path = model.model_path
        self.loaded_iter = None

        if load_iteration is not None:
            if load_iteration == -1:
                self.loaded_iter = search_for_max_iteration(
                    os.path.join(self.model_path, "point_cloud")
                )
            else:
                self.loaded_iter = load_iteration
            print(f"Loading trained model at iteration {self.loaded_iter}")

        info: SceneInfo = load_scene_info(
            model.source_path,
            images_dir=model.images,
            eval_split=model.eval,
            white_background=model.white_background,
            load_images=load_images,
        )

        if not self.loaded_iter:
            os.makedirs(self.model_path, exist_ok=True)
            shutil.copyfile(
                info.ply_path, os.path.join(self.model_path, "input.ply")
            )
            cam_json = [
                camera_to_json(i, c)
                for i, c in enumerate(info.train_cameras + info.test_cameras)
            ]
            with open(os.path.join(self.model_path, "cameras.json"), "w") as f:
                json.dump(cam_json, f)

        if shuffle:
            random.shuffle(info.train_cameras)
            random.shuffle(info.test_cameras)

        self.cameras_extent = info.radius
        self.train_cameras = {}
        self.test_cameras = {}
        for scale in resolution_scales:
            self.train_cameras[scale] = load_camera_images(
                list(info.train_cameras), model.resolution, scale
            )
            self.test_cameras[scale] = load_camera_images(
                list(info.test_cameras), model.resolution, scale
            )

        if self.loaded_iter:
            self.gaussians: GaussianState = load_gaussian_ply(
                os.path.join(
                    self.model_path,
                    "point_cloud",
                    f"iteration_{self.loaded_iter}",
                    "point_cloud.ply",
                ),
                max_sh_degree=model.sh_degree,
                spatial_lr_scale=self.cameras_extent,
                capacity=capacity,
            )
        else:
            self.gaussians = create_from_pcd(
                info.point_cloud.points,
                info.point_cloud.colors,
                spatial_lr_scale=self.cameras_extent,
                max_sh_degree=model.sh_degree,
                capacity=capacity,
            )

    def save(self, iteration: int, state: Optional[GaussianState] = None):
        out = os.path.join(
            self.model_path, "point_cloud", f"iteration_{iteration}"
        )
        os.makedirs(out, exist_ok=True)
        save_gaussian_ply(
            state if state is not None else self.gaussians,
            os.path.join(out, "point_cloud.ply"),
        )

    def get_train_cameras(self, scale=1.0) -> List[Camera]:
        return self.train_cameras[scale]

    def get_test_cameras(self, scale=1.0) -> List[Camera]:
        return self.test_cameras[scale]
