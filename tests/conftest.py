from __future__ import annotations

import pytest

from trianglecount_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="tc-spark-tests", cores=8, shuffle_partitions=8)
    yield s


def edges_df(spark, pairs):
    """Undirected edge list (as given, possibly messy) → DataFrame[src,dst]."""
    return spark.createDataFrame([(int(a), int(b)) for a, b in pairs], "src long, dst long")


# Golden micro-graphs (FIXTURES.md §3). Values are raw input edge lists —
# canonicalization is under test, so some are deliberately messy.
GOLDEN = {
    "tri": ([(0, 1), (1, 2), (0, 2)], 1),
    "k4": ([(a, b) for a in range(4) for b in range(a + 1, 4)], 4),
    "k5": ([(a, b) for a in range(5) for b in range(a + 1, 5)], 10),
    "bowtie": ([(0, 1), (1, 2), (0, 2), (2, 3), (3, 4), (2, 4)], 2),
    "star5": ([(0, i) for i in range(1, 6)], 0),
    "path6": ([(i, i + 1) for i in range(5)], 0),
    "bipartite33": ([(a, b) for a in range(3) for b in range(3, 6)], 0),
    "tri_pendant": ([(0, 1), (1, 2), (0, 2), (2, 3)], 1),
    "two_tris": ([(0, 1), (1, 2), (0, 2), (3, 4), (4, 5), (3, 5)], 2),
    "diamond": ([(0, 1), (0, 2), (1, 2), (1, 3), (2, 3)], 2),
    "selfloop_dup": (
        [(0, 1), (1, 2), (0, 2), (1, 1), (0, 1), (0, 1), (1, 0), (2, 0)],
        1,
    ),
    "hub": (
        [(0, i) for i in range(1, 101)] + [(i, i + 1) for i in range(1, 100)],
        99,
    ),
}
