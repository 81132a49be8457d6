from wireframe_tpu.ops.pairs import (  # noqa: F401
    num_pairs,
    triu_pairs,
    pair_slot,
    pair_validity_mask,
    edge_labels_from_edges,
)
from wireframe_tpu.ops.masked_pool import masked_max, masked_mean  # noqa: F401
from wireframe_tpu.ops.lsa import solve_lsa, solve_lsa_batch  # noqa: F401
