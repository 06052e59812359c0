from .readers import (  # noqa: F401
    EDGE_LABELED_SCHEMA,
    EDGE_SCHEMA,
    NODE_INFO_SCHEMA,
    load_table,
    load_tables,
    read_edges,
    read_ground_truth,
    read_labeled_edges,
    read_node_info,
    sample_deterministic,
    write_bucketed,
    write_parquet,
)
