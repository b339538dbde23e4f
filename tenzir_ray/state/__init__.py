"""Shared/keyed state utilities (reference: Tenzir contexts, §2.6).

Tenzir's node-resident keyed state (lookup-table / bloom-filter contexts,
builtins/contexts/*.cpp) maps to two Ray-native shapes:

- **broadcast state** (read-mostly): build once, ``ray.put``, read per
  actor in ``__init__`` — see :func:`tenzir_ray.stages.ops.enrich`.
- **shared mutable state**: a named Ray actor holding the table, updated
  by one pipeline and probed by others — :class:`ContextActor` here.
"""

from tenzir_ray.state.context import (
    BloomFilter,
    ContextActor,
    context_enrich,
    context_inspect,
    context_load,
    context_save,
)

__all__ = ["ContextActor", "context_enrich", "BloomFilter",
           "context_save", "context_load", "context_inspect"]
