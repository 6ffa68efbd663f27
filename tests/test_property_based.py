"""Property-based tests (hypothesis) for the stateful utility layers,
mirroring the reference's use of hypothesis on StoredArrays and hrex
utilities (ref tests/test_stored_arrays.py, tests/hrex/test_hrex.py;
SURVEY §4 pattern 8)."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from timemachine_tpu.fe.stored_arrays import StoredArrays
from timemachine_tpu.md.hrex import HREX
from timemachine_tpu.utils import batches

# -- StoredArrays: behaves exactly like the concatenation of its chunks -----

chunk_lists = st.lists(
    st.lists(st.integers(-1000, 1000), min_size=1, max_size=7),
    min_size=0,
    max_size=6,
)


@settings(max_examples=50, deadline=None)
@given(chunk_lists)
def test_stored_arrays_round_trips_chunks(chunks):
    # rows must share a shape: pad each chunk's rows to width 3
    chunks = [[[float(x), float(x) + 0.5, -float(x)] for x in chunk] for chunk in chunks]
    sa = StoredArrays.from_chunks(chunks)
    flat = [row for chunk in chunks for row in chunk]
    assert len(sa) == len(flat)
    for i in range(len(flat)):
        np.testing.assert_array_equal(sa[i], flat[i])
        np.testing.assert_array_equal(sa[i - len(flat)], flat[i])  # negative idx
    if flat:
        np.testing.assert_array_equal(sa[1:], np.asarray(flat)[1:])
    assert list(map(tuple, iter(sa))) == list(map(tuple, flat))


@settings(max_examples=30, deadline=None)
@given(chunk_lists, chunk_lists)
def test_stored_arrays_equality_ignores_chunk_boundaries(chunks_a, chunks_b):
    widen = lambda chunks: [[[float(x)] for x in chunk] for chunk in chunks]
    sa, sb = StoredArrays.from_chunks(widen(chunks_a)), StoredArrays.from_chunks(widen(chunks_b))
    flat_a = [x for c in chunks_a for x in c]
    flat_b = [x for c in chunks_b for x in c]
    same = len(sa) == len(sb) and all(np.array_equal(sa[i], sb[i]) for i in range(len(sa)))
    assert same == (flat_a == flat_b)


# -- batches: partition invariants -------------------------------------------


@settings(max_examples=50, deadline=None)
@given(st.integers(0, 10_000), st.integers(1, 512))
def test_batches_partition(n, batch_size):
    sizes = list(batches(n, batch_size))
    assert sum(sizes) == n
    assert all(0 < s <= batch_size for s in sizes)
    assert all(s == batch_size for s in sizes[:-1])  # only the tail may be short


# -- HREX neighbor swaps: permutation validity under arbitrary energies ------


# NOTE: the jitted swap scan retraces per (n_pairs, n_attempts) shape — keep
# the shape space tiny so hypothesis varies the VALUES, not the compile cache
@settings(max_examples=15, deadline=None)
@given(
    st.sampled_from([2, 4, 6]),
    st.sampled_from([8, 27]),
    st.integers(0, 2**31 - 1),
    st.floats(-50.0, 50.0),
)
def test_neighbor_swaps_preserve_permutation(n_states, n_attempts, seed, scale):
    rng = np.random.default_rng(seed)
    log_q_kl = rng.normal(0.0, 1.0, (n_states, n_states)) * scale
    hrex = HREX.from_replicas(list(range(n_states)))
    neighbor_pairs = [(i, i + 1) for i in range(n_states - 1)]
    hrex2, stats = hrex.attempt_neighbor_swaps_fast(
        neighbor_pairs, np.asarray(log_q_kl), n_attempts, seed
    )
    perm = list(hrex2.replica_idx_by_state)
    assert sorted(perm) == list(range(n_states))  # still a permutation
    assert len(stats) == len(neighbor_pairs)
    assert all(0 <= acc <= prop for acc, prop in stats)
    assert sum(prop for _, prop in stats) == n_attempts


@settings(max_examples=10, deadline=None)
@given(st.sampled_from([3, 5]), st.sampled_from([8, 27]), st.integers(0, 2**31 - 1))
def test_neighbor_swaps_deterministic_in_seed(n_states, n_attempts, seed):
    log_q_kl = np.random.default_rng(7).normal(0.0, 2.0, (n_states, n_states))
    neighbor_pairs = [(i, i + 1) for i in range(n_states - 1)]

    def run():
        hrex = HREX.from_replicas(list(range(n_states)))
        h2, stats = hrex.attempt_neighbor_swaps_fast(neighbor_pairs, np.asarray(log_q_kl), n_attempts, seed)
        return list(h2.replica_idx_by_state), np.asarray(stats)

    p1, f1 = run()
    p2, f2 = run()
    assert p1 == p2
    np.testing.assert_array_equal(f1, f2)


@settings(max_examples=10, deadline=None)
@given(st.sampled_from([2, 4]), st.integers(0, 2**31 - 1))
def test_neighbor_swaps_equal_energies_mix(n_states, seed):
    """With all states energetically identical every proposed swap accepts,
    so the sampler must actually move replicas (mixing sanity)."""
    log_q_kl = np.zeros((n_states, n_states))
    neighbor_pairs = [(i, i + 1) for i in range(n_states - 1)]
    hrex = HREX.from_replicas(list(range(n_states)))
    hrex2, stats = hrex.attempt_neighbor_swaps_fast(
        neighbor_pairs, log_q_kl, n_states**3, seed
    )
    assert sorted(hrex2.replica_idx_by_state) == list(range(n_states))
    for acc, prop in stats:
        assert acc == prop  # every proposed swap accepts
