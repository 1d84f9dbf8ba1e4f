from .partition import RowPartition, partition_model
from .sharded import ShardedSolution
