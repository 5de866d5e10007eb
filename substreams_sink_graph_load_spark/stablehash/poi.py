"""Proof-of-indexing: graph-node-compatible per-block digest chain
(behavioral port of ref poi/poi.go, poi/entity.go, poi/event.go).

Digest layout: 32 bytes = 24-byte commutative mixer state + 8-byte LE event
count.  Per block: each entity change is hashed at address chain
``[1, 0, block_num, 0, event_index]`` off the root; ``pause`` then writes the
event count at ``[1, 0, block_num, 0]`` and mixes in the previous block's
digest — a prefix fold under the commutative mixer, which is what lets Spark
compute per-block states in parallel and chain them after.
"""

from __future__ import annotations

import base64

from .big_decimal import BigDecimal
from .core import ADDRESS_ROOT, FastHasher, addr_child, addr_children
from .values import (
    BigDecimalVal,
    BigIntVal,
    Bool,
    Bytes,
    Hashable,
    I32,
    ListVal,
    MapVal,
    String,
    U64,
)

OP_REMOVE_VARIANT = 0x1
OP_SET_VARIANT = 0x2

# Map entries hash into an INDEPENDENT hasher rooted at the unordered
# address pair (core.addr_unordered -> children of ADDRESS_ROOT), so an
# entry's 32-byte state depends only on (field name, typed value) — never
# on the event address.  That makes it memoizable across events: schema
# field names repeat every event and change-stream values repeat heavily,
# so the ~4 xxh3 calls per entry collapse to a dict lookup; only the final
# mix-in write at the event-specific address remains per-event (measured
# ~3x on the run-stage fold).  Bounded: insertion stops at the cap so a
# high-cardinality value column can't grow the worker heap unboundedly.
_ENTRY_CACHE: dict[tuple, bytes] = {}
_ENTRY_CACHE_MAX = 1 << 18
_MAP_KEY_ADDR = addr_child(ADDRESS_ROOT, 0)
_MAP_VAL_ADDR = addr_child(ADDRESS_ROOT, 1)


def _map_entry_state(name: str, typed: dict) -> bytes:
    """32-byte independent-hasher state of one ``{name: typed-value}`` map
    entry (identical to what ``MapVal.stable_hash`` feeds its final write)."""
    key = None
    if len(typed) == 1:
        ((tag, raw),) = typed.items()
        if raw is None or isinstance(raw, (str, int, bool)):
            key = (name, tag, raw)
            st = _ENTRY_CACHE.get(key)
            if st is not None:
                return st
    inner = FastHasher()
    String(name).stable_hash(_MAP_KEY_ADDR, inner)
    EntityValue(typed).stable_hash(_MAP_VAL_ADDR, inner)
    st = inner.to_bytes()
    if key is not None and len(_ENTRY_CACHE) < _ENTRY_CACHE_MAX:
        _ENTRY_CACHE[key] = st
    return st


class EntityValue(Hashable):
    """A typed change-stream value ``{"<Key>": raw}`` hashed as graph-node's
    Value: inner at child(0), then the variant byte at the address
    (ref poi/entity.go:17-78)."""

    def __init__(self, typed: dict):
        self.typed = typed

    def _to_hashable(self) -> tuple[Hashable, int]:
        t = self.typed
        if "String_" in t:
            v = t["String_"]
            if "\u0000" in v:
                v = v.replace("\u0000", "")  # Postgres NUL scrub, also hashed scrubbed
            return String(v), 0x1
        if "Int32" in t:
            return I32(int(t["Int32"])), 0x2
        if "Bigdecimal" in t:
            return BigDecimalVal(BigDecimal.from_string(t["Bigdecimal"])), 0x3
        if "Bool" in t or "Boolean" in t:
            return Bool(bool(t.get("Bool", t.get("Boolean")))), 0x4
        if "Array" in t:
            values = (t["Array"] or {}).get("value") or []
            return (
                ListVal([EntityValue(v.get("Typed", v)) for v in values]),
                0x5,
            )
        if "Bytes" in t:
            return Bytes(base64.b64decode(t["Bytes"])), 0x6
        if "Bigint" in t:
            return BigIntVal(int(t["Bigint"], 10)), 0x7
        raise ValueError(f"value of type {sorted(t)} not implemented")

    def stable_hash(self, addr, hasher):
        inner, variant = self._to_hashable()
        inner.stable_hash(addr_child(addr, 0), hasher)
        hasher.write(addr, bytes([variant]))


class SetEntity(Hashable):
    """graph-node ProofOfIndexingEvent::SetEntity (variant byte 0x2)."""

    def __init__(self, entity_type: str, entity_id: str, fields: list[dict]):
        # fields: [{"name": ..., "new_value": {"Typed": {...}}}]
        self.entity_type = entity_type
        self.entity_id = entity_id
        self.data = {
            f["name"]: EntityValue(f["new_value"]["Typed"]) for f in fields
        }

    def stable_hash(self, addr, hasher):
        String(self.entity_type).stable_hash(addr_child(addr, 0), hasher)
        String(self.entity_id).stable_hash(addr_child(addr, 1), hasher)
        # inline MapVal semantics with the per-entry state memoized (the
        # entry states are event-address-independent; see _map_entry_state)
        maddr = addr_child(addr, 2)
        for name, ev in self.data.items():
            hasher.write(maddr, _map_entry_state(name, ev.typed))
        hasher.write(addr, bytes([OP_SET_VARIANT]))


class RemoveEntity(Hashable):
    """graph-node ProofOfIndexingEvent::RemoveEntity (variant byte 0x1)."""

    def __init__(self, entity_type: str, entity_id: str):
        self.entity_type = entity_type
        self.entity_id = entity_id

    def stable_hash(self, addr, hasher):
        String(self.entity_type).stable_hash(addr_child(addr, 0), hasher)
        String(self.entity_id).stable_hash(addr_child(addr, 1), hasher)
        hasher.write(addr, bytes([OP_REMOVE_VARIANT]))


class ProofOfIndexing:
    """One block's event stream -> 32-byte digest state."""

    def __init__(self, block_number: int):
        self.block_number = block_number
        self.vec_length = 0
        self.hasher = FastHasher()

    def _event_addr(self) -> int:
        return addr_children(
            ADDRESS_ROOT, (1, 0, self.block_number, 0, self.vec_length)
        )

    def write(self, event: Hashable) -> None:
        event.stable_hash(self._event_addr(), self.hasher)
        self.vec_length += 1

    def set_entity(self, entity_type: str, entity_id: str, fields: list[dict]) -> None:
        self.write(SetEntity(entity_type, entity_id, fields))

    def remove_entity(self, entity_type: str, entity_id: str) -> None:
        self.write(RemoveEntity(entity_type, entity_id))

    def pause(self, prev: bytes | None = None) -> bytes:
        """Close the block: write the event count, chain the previous
        digest, return the 32-byte digest (ref poi/poi.go:48-73)."""
        addr = addr_children(ADDRESS_ROOT, (1, 0, self.block_number, 0))
        U64(self.vec_length).stable_hash(addr, self.hasher)
        if prev:
            self.hasher.mixin(FastHasher.from_bytes(prev))
        return self.hasher.to_bytes()

    def current_hex(self) -> str:
        return self.hasher.to_bytes().hex()


def chain_block_states(states: list[tuple[int, bytes]], start: bytes | None = None) -> list[tuple[int, bytes]]:
    """Fold per-block *paused* states (pre-chain) into the digest chain.

    ``states`` are (block_num, state32) where state32 already includes the
    block's own count write; mixing is the monoid add, so
    digest_b = state_b (+) digest_{b-1}.
    """
    out = []
    prev = start
    for block, state in sorted(states):
        h = FastHasher.from_bytes(state)
        if prev:
            h.mixin(FastHasher.from_bytes(prev))
        digest = h.to_bytes()
        out.append((block, digest))
        prev = digest
    return out
