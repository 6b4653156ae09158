"""Deterministic constants shared by Spark plans and DuckDB oracle
SQL — generated with a fixed LCG so both sides see the exact same
decimal literals (no numpy/random: reproducible across processes).
"""

from __future__ import annotations

EMBED_DIM = 64


def _lcg(seed: int):
    x = seed & 0xFFFFFFFFFFFFFFFF
    while True:
        x = (x * 6364136223846793005 + 1442695040888963407) & 0xFFFFFFFFFFFFFFFF
        yield x


def det_vector(seed: int, dim: int = EMBED_DIM, scale: float = 0.5) -> list[float]:
    """Uniform(-scale, scale) vector, rounded to 6 decimals so the
    literal parses to the identical double on both engines."""
    g = _lcg(seed)
    return [round((next(g) / 2**64 * 2 - 1) * scale, 6) for _ in range(dim)]


# Q19: one fixed query vector.
Q19_QUERY_VEC = det_vector(19)

# Q22: ten fixed query vectors (reference retrieval shape:
# rag_chatbot/main.py:31-47). Threshold chosen so both accept and
# reject branches occur on the synthetic corpus (the reference's own
# constant is 1.0 for 384-d MiniLM vectors; here corpus NN distances
# sit around 2-4, so 1.0 would reject everything and test nothing —
# the strict-> semantics are what we preserve).
Q22_QUERY_VECS = [det_vector(2200 + i) for i in range(10)]
Q22_THRESHOLD = 2.6
Q22_SENTINEL = "I don't have information on that subject."

# Q27: five query vectors for cosine ANN.
Q27_QUERY_VECS = [det_vector(2700 + i) for i in range(5)]

# Q28: eight IVF centroids (deterministic "trained" index).
Q28_CENTROIDS = [det_vector(2800 + i) for i in range(8)]

# Q38: four random hyperplanes → 16 LSH buckets (sign-bit SimHash
# bucketing for embeddings).
Q38_PLANES = [det_vector(3800 + i) for i in range(4)]

# q49: the retrieval query text embedded by the (fake) encoder on
# both engines — R15→R17 end-to-end.
Q49_QUERY_TEXT = "the quick brown fox jumps over the lazy dog"

# q82: two LSH bands × four hyperplanes each (OR-of-ANDs banding) for
# the blocked near-dup composition — blocking keys on both engines
# derive from the same literals.
Q82_BANDS = [[det_vector(8200 + 16 * b + i) for i in range(4)] for b in range(2)]
