"""L6 utilities: pytree helpers, integer apportionment, test fixtures."""

from vit_marl_tpu.utils.tree import (  # noqa: F401
    tree_stack,
    tree_unstack,
    index_tree,
)
from vit_marl_tpu.utils.ints import (  # noqa: F401
    argsort_rev,
    rank_rev,
    clip_by_sum_int,
    hamilton_apportionment_permuted,
)
from vit_marl_tpu.utils.fixtures import (  # noqa: F401
    random_book,
    random_message,
    random_cancel_for_book,
    random_aggressive_message,
)
