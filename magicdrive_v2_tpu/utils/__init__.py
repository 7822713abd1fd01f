from .misc import (
    Timer,
    add_box_latent,
    collate_bboxes_to_maxlen,
    count_params,
    format_numel_str,
    reset_logger,
    to_jnp_dtype,
    warn_once,
)

__all__ = [
    "Timer", "add_box_latent", "collate_bboxes_to_maxlen", "count_params",
    "format_numel_str", "reset_logger", "to_jnp_dtype", "warn_once",
]
