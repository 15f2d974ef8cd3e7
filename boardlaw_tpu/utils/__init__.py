from .trees import (  # noqa: F401
    map_tree,
    stack,
    concat,
    where,
    index,
    leading_shape,
    flatten_leading,
    unflatten_leading,
)
