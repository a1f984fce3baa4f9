from dalle_mtf_tpu.parallel.mesh import (  # noqa: F401
    P,
    build_mesh,
    constrain,
    logical_to_pspec,
    named_sharding,
    parse_layout,
    parse_mesh_shape,
    tree_shardings,
)
