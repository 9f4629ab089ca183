"""Runtime utilities (the erl_common-equivalent layer, SURVEY.md §2.2):
logging/timing, checkpoint serialization, binary data loaders."""

from erl_gaussian_process_tpu.utils.config import (
    as_yaml_file,
    as_yaml_str,
    create_setting,
    from_yaml_file,
    from_yaml_str,
    register_setting,
    setting_names,
)
from erl_gaussian_process_tpu.utils.serialization import (
    eq_state,
    load_pytree,
    save_pytree,
)
from erl_gaussian_process_tpu.utils.native import (
    load_tokens,
    native_available,
    raycast_2d,
    save_tokens,
)
from erl_gaussian_process_tpu.utils.timing import (
    BlockTimer,
    memory_usage,
    report_time,
    trace,
)
from erl_gaussian_process_tpu.utils.model_selection import (
    nlml_sweep,
    nlml_sweep_nigp,
    nlml_sweep_spgp,
    select_scale,
    select_scale_nigp,
    select_scale_spgp,
)

__all__ = [
    "eq_state", "load_pytree", "save_pytree", "BlockTimer", "report_time", "memory_usage", "trace",
    "native_available", "save_tokens", "load_tokens", "raycast_2d",
    "as_yaml_file", "as_yaml_str", "create_setting", "from_yaml_file",
    "from_yaml_str", "register_setting", "setting_names",
    "nlml_sweep", "nlml_sweep_nigp", "nlml_sweep_spgp",
    "select_scale", "select_scale_nigp", "select_scale_spgp",
]
