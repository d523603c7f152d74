from aten_tpu.scene.scene import SceneBuilder, SceneData  # noqa: F401
from aten_tpu.scene.materials import MaterialType  # noqa: F401
from aten_tpu.scene.lights import LightType  # noqa: F401
