"""Device-mesh parallelism: chain sharding + replica exchange (new
first-class capability of the TPU build; SURVEY.md §2.4)."""

from vaemolsim_tpu.parallel.distributed import (  # noqa: F401
    broadcast_from_coordinator,
    global_to_local,
    initialize_distributed,
    is_coordinator,
    local_to_global,
    process_allmean,
    process_count,
    process_index,
    shutdown_distributed,
    sync_processes,
)
from vaemolsim_tpu.parallel.hrex import (  # noqa: F401
    HREXState,
    make_hrex_step,
    run_hrex,
)
from vaemolsim_tpu.parallel.remd import (  # noqa: F401
    REMDState,
    make_remd_step,
    run_remd,
)
from vaemolsim_tpu.parallel.replica import (  # noqa: F401
    REMCState,
    make_remc_step,
    run_remc,
    temperature_ladder,
)
from vaemolsim_tpu.parallel.sharding import (  # noqa: F401
    chain_sharding,
    make_hybrid_mesh,
    make_mesh,
    replicate,
    shard_chain_state,
)
