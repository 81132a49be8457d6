from wireframe_tpu.ops.pairs import (  # noqa: F401
    num_pairs,
    triu_pairs,
    pair_slot,
    pair_validity_mask,
    edge_labels_from_edges,
)
from wireframe_tpu.ops.masked_pool import masked_max, masked_mean  # noqa: F401
from wireframe_tpu.ops.lsa import (  # noqa: F401
    solve_lsa,
    solve_lsa_batch,
    solve_lsa_rows,
    solve_lsa_rows_batch,
)
from wireframe_tpu.ops.matcher import WireframeMatcher  # noqa: F401
from wireframe_tpu.ops.adjacency import (  # noqa: F401
    adjacency_from_edge_probs,
    edge_probs_from_adjacency,
)
