from .lineage import (  # noqa: F401
    completed_partitions,
    read_lineage,
    write_partitioned,
)
