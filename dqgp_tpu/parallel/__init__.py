from .consensus import (
    AgentBatch,
    admm_iteration,
    agents_mesh,
    make_agent_batch,
    make_admm_step,
)
