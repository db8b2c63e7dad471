from rsoderh_raytracing_tpu.scene.types import (  # noqa: F401
    Material,
    Sphere,
    Plane,
    Scene,
    Bounds3,
)
from rsoderh_raytracing_tpu.scene.camera import Camera  # noqa: F401
from rsoderh_raytracing_tpu.scene.toml_loader import load_scene  # noqa: F401
