from .consensus import (
    AgentBatch,
    admm_iteration,
    agents_mesh,
    make_agent_batch,
    make_admm_step,
    shard_batch_to_mesh,
)
from .training2d import (
    agents_data_mesh,
    make_admm_step_2d,
    shard_batch_to_mesh_2d,
)
