"""Multi-chip execution: row-partitioned distributed GMRES over a
jax.sharding.Mesh (the capability the reference lacks entirely — its only
multi-domain machinery is the in-process METIS/Schur path, SURVEY.md §2.7
P4/P5; here rows shard across chips, dots psum over ICI, and the Krylov
vector reaches remote SpMV tiles via all_gather)."""

from gmres_tpu.parallel.mesh import make_mesh, row_specs
from gmres_tpu.parallel.partition import RowPartition, partition_rows
from gmres_tpu.parallel.dist_gmres import (
    DistGmresSolver,
    RowShardedOp,
    dist_gmres,
)

__all__ = [
    "make_mesh",
    "row_specs",
    "RowPartition",
    "partition_rows",
    "DistGmresSolver",
    "RowShardedOp",
    "dist_gmres",
]
