from pmpx.parallel.mesh import (
    AXIS_CHAINS,
    AXIS_DATA,
    AXIS_TREE,
    make_mesh,
)
from pmpx.parallel.chains import (
    run_chains_data_sharded,
    make_chain_farm_fused,
    run_chains_fused,
    run_chains_sharded,
    run_chains_vmapped,
)
from pmpx.parallel.sharded_linreg import ShardedLinReg
from pmpx.parallel.sharded_nn import ShardedNNPosterior
from pmpx.parallel.tree_shard import make_tree_sharded_superstep

__all__ = [
    "AXIS_CHAINS",
    "AXIS_DATA",
    "AXIS_TREE",
    "make_mesh",
    "run_chains_data_sharded",
    "make_chain_farm_fused",
    "run_chains_fused",
    "run_chains_sharded",
    "run_chains_vmapped",
    "ShardedLinReg",
    "ShardedNNPosterior",
    "make_tree_sharded_superstep",
]
