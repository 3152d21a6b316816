"""Property-based checks of the format-v4 metadata layer (no Spark):
for ANY sequence of bucket updates/removals interleaved with
serialize→reload cycles, the ShardedFileMap + group/shard files
behave exactly like a plain dict — same contents, same keys — and
serialization is idempotent (same logical state → byte-identical
document, shared content-addressed files).

These run on top of the structural unit tests in
test_manifest_shards.py: those pin the COSTS (O(touched) commits,
O(touched) hydration), these pin the SEMANTICS under adversarial
operation orders that hand-written cases miss (remove-then-re-add,
whole-group removal, updates straddling group boundaries, repeated
serialization of derived maps, mixed clean/dirty lineages).
"""

import json
import os

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

import etl_spark.table.manifest as M
from etl_spark.table.manifest import ColumnDef, ShardedFileMap, Snapshot, TableSchema

SCHEMA = TableSchema([ColumnDef(1, "k", "string"), ColumnDef(2, "v", "long")])


def _entry(b: int, tag: int) -> dict:
    return {"path": f"/data/w{tag}/__bucket={b}", "kind": "base", "sv": 1,
            "bytes": 10 + tag, "rows": 1 + tag, "nb": 64}


def _snap(files, version=1) -> Snapshot:
    return Snapshot(version=version, current_schema_version=1,
                    schemas={1: SCHEMA}, num_buckets=64, files=files,
                    properties={})


# one op = (kind, payload):
#   ("update", {bucket: tag})   -> set those buckets' entry lists
#   ("remove", [bucket, ...])   -> drop those buckets
#   ("reload", None)            -> serialize to disk, parse back (lazy)
#   ("iterate", None)           -> full walk (hydrates every group —
#                                  the per-batch sizing access pattern)
ops_strategy = st.lists(
    st.one_of(
        st.tuples(st.just("update"),
                  st.dictionaries(st.integers(0, 63), st.integers(1, 5),
                                  min_size=1, max_size=6)),
        st.tuples(st.just("remove"),
                  st.lists(st.integers(0, 63), min_size=1, max_size=6)),
        st.tuples(st.just("reload"), st.none()),
        st.tuples(st.just("iterate"), st.none()),
    ),
    min_size=1, max_size=12,
)


@settings(max_examples=60, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(ops=ops_strategy, gsize=st.sampled_from([1, 2, 7, 64]),
       n0=st.integers(0, 20))
def test_map_matches_model_under_any_op_sequence(tmp_path, ops, gsize, n0):
    """The lazy two-level map is observationally a dict through any
    update/remove/serialize/reload interleaving."""
    import tempfile

    man_dir = tempfile.mkdtemp(dir=str(tmp_path), prefix="man")
    old_gs = M.GROUP_SIZE
    M.GROUP_SIZE = gsize
    try:
        model = {b: [_entry(b, 0)] for b in range(n0)}
        files = {b: list(es) for b, es in model.items()}
        version = 1
        touched: set = set()  # buckets changed since the last reload
        for kind, payload in ops:
            if kind == "update":
                changes = {b: [_entry(b, t)] for b, t in payload.items()}
                model.update({b: list(es) for b, es in changes.items()})
                touched |= set(changes)
                if isinstance(files, ShardedFileMap):
                    files = files.updated(changes)
                else:
                    files = dict(files); files.update(changes)
            elif kind == "remove":
                for b in payload:
                    model.pop(b, None)
                touched |= set(payload)
                if isinstance(files, ShardedFileMap):
                    files = files.updated({}, removed=set(payload))
                else:
                    files = {b: es for b, es in files.items()
                             if b not in set(payload)}
            elif kind == "iterate":
                # the per-batch sizing access pattern: hydrate all
                assert len(files) == len(model)
            else:  # reload
                text = _snap(files, version).to_json(man_dir)
                files = Snapshot.from_json(text, man_dir).files
                version += 1
                touched = set()
            if isinstance(files, ShardedFileMap) and files.group_size:
                # the serialization/diff walk over the clean groups must
                # see exactly the dirty groups' surviving buckets — the
                # incrementally-tracked loose/membership bookkeeping
                # agrees with the model at every step, regardless of
                # hydration order
                gs = files.group_size
                dirty = {b // gs for b in touched}
                want = {b for b in model if b // gs in dirty}
                got = files.buckets_outside_groups(set(files.group_keys()))
                assert got == sorted(want)
        # final full comparison (hydrates everything)
        assert {b: list(files[b]) for b in files} == model
        # membership + ref paths agree with the model too
        for b in range(64):
            assert (b in files) == (b in model)
    finally:
        M.GROUP_SIZE = old_gs


@settings(max_examples=40, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(touched=st.dictionaries(st.integers(0, 63), st.integers(1, 5),
                               min_size=1, max_size=8),
       gsize=st.sampled_from([2, 7, 64]))
def test_serialization_is_deterministic_and_shares_untouched(tmp_path, touched, gsize):
    """Same logical state → byte-identical snapshot document (absorb
    write-back included), and a derived snapshot's document differs
    from its parent ONLY in the touched buckets' groups."""
    import tempfile

    man_dir = tempfile.mkdtemp(dir=str(tmp_path), prefix="man")
    old_gs = M.GROUP_SIZE
    M.GROUP_SIZE = gsize
    try:
        base = {b: [_entry(b, 0)] for b in range(40)}
        doc1 = _snap(dict(base), 1).to_json(man_dir)
        # idempotent: serializing an equal state again is byte-identical
        assert _snap(dict(base), 1).to_json(man_dir) == doc1
        # reload, derive, serialize — twice (post-absorb re-serialize)
        fm = Snapshot.from_json(doc1, man_dir).files
        child = fm.updated({b: [_entry(b, t)] for b, t in touched.items()})
        snap2 = _snap(child, 2)
        doc2 = snap2.to_json(man_dir)
        assert snap2.to_json(man_dir) == doc2  # absorb didn't change output
        g1 = json.loads(doc1)["groups_ref"]
        g2 = json.loads(doc2)["groups_ref"]
        dirty = {str(b // gsize) for b in touched}
        assert {g: k for g, k in g1.items() if g not in dirty} == \
               {g: k for g, k in g2.items() if g not in dirty}
        assert all(g1[g] != g2[g] for g in dirty if g in g1)
        # and the content is right
        reread = Snapshot.from_json(doc2, man_dir).files
        want = dict(base)
        want.update({b: [_entry(b, t)] for b, t in touched.items()})
        assert {b: list(reread[b]) for b in reread} == want
    finally:
        M.GROUP_SIZE = old_gs
