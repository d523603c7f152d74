from aten_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    render_tiled,
    make_train_step,
)
