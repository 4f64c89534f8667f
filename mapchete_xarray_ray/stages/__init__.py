"""Ray Data stages: vectorized ``map_batches`` callables (pure fns) and
actor-pool classes. Every stage is Arrow-in / Arrow-out
(``batch_format="pyarrow"``) unless a kernel genuinely needs pandas."""
