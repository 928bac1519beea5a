"""Scene state: the TPU equivalents of the reference's L2 descriptor-set
objects (Camera, VolumeData, DirLight, PointLight, HdrEnvMap) as pytrees."""

from neuralradiancecaching_tpu.scene.camera import Camera  # noqa: F401
from neuralradiancecaching_tpu.scene.scene import (  # noqa: F401
    DirLight, PointLight, Scene, make_scene)
