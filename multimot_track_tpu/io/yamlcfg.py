"""OpenCV-YAML settings parsing (the reference's kitti03.yaml format).

The reference reads calibration/ORB/viewer settings through cv::FileStorage
(src/Tracking.cc:142-236).  OpenCV YAML starts with a ``%YAML:1.0``
directive PyYAML rejects; strip it and map the flat keys onto the typed
PipelineConfig.
"""

from __future__ import annotations

import dataclasses
import pathlib

import yaml

from multimot_track_tpu.config import CameraConfig, PipelineConfig, DEFAULT_CONFIG


def load_opencv_yaml(path) -> dict:
    text = pathlib.Path(path).read_text()
    lines = [l for l in text.splitlines() if not l.startswith("%YAML")]
    return yaml.safe_load("\n".join(lines)) or {}


def config_from_yaml(path, base: PipelineConfig = DEFAULT_CONFIG) -> PipelineConfig:
    d = load_opencv_yaml(path)

    def g(key, default):
        return d.get(key, default)

    cam = CameraConfig(
        fx=float(g("Camera.fx", base.camera.fx)),
        fy=float(g("Camera.fy", base.camera.fy)),
        cx=float(g("Camera.cx", base.camera.cx)),
        cy=float(g("Camera.cy", base.camera.cy)),
        bf=float(g("Camera.bf", base.camera.bf)),
        width=int(g("Camera.width", base.camera.width)),
        height=int(g("Camera.height", base.camera.height)),
        fps=float(g("Camera.fps", base.camera.fps)),
        depth_map_factor=float(g("DepthMapFactor", base.camera.depth_map_factor)),
        k1=float(g("Camera.k1", base.camera.k1)),
        k2=float(g("Camera.k2", base.camera.k2)),
        p1=float(g("Camera.p1", base.camera.p1)),
        p2=float(g("Camera.p2", base.camera.p2)),
        k3=float(g("Camera.k3", base.camera.k3)),
    )
    fe = dataclasses.replace(
        base.frontend,
        n_features=int(g("ORBextractor.nFeatures", base.frontend.n_features)),
        scale_factor=float(g("ORBextractor.scaleFactor", base.frontend.scale_factor)),
        n_levels=int(g("ORBextractor.nLevels", base.frontend.n_levels)),
        fast_threshold=int(g("ORBextractor.iniThFAST", base.frontend.fast_threshold)),
        fast_min_threshold=int(g("ORBextractor.minThFAST", base.frontend.fast_min_threshold)),
    )
    return dataclasses.replace(base, camera=cam, frontend=fe)
