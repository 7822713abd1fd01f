from .sharding import (
    DP_AXIS,
    SP_AXIS,
    dp_size,
    get_current_mesh,
    make_mesh,
    shard_hint,
    sp_size,
    use_mesh,
)

__all__ = ["DP_AXIS", "SP_AXIS", "dp_size", "get_current_mesh", "make_mesh",
           "shard_hint", "sp_size", "use_mesh"]
