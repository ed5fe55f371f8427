"""Checkpoint I/O: torch ``.pth`` import/export and native self-describing
checkpoints (msgpack / orbax)."""

from efficientdepthestimation_tpu.checkpoints.pth_import import (
    import_pth,
    load_torch_state_dict,
    variables_from_state_dict,
    state_dict_from_variables,
)
from efficientdepthestimation_tpu.checkpoints.serialization import (
    save_checkpoint,
    load_checkpoint,
    save_midas,
    load_midas,
)
