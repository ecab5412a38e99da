"""The registry/test counts in COVERAGE.md and README.md are generated
(scripts/gen_coverage_counts.py) — this guard fails the suite the moment
they lag the code (VERDICT r05 #6: the hand-written header drifted by 65
queries / 435 tests)."""

import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(ROOT, "scripts"))


def test_doc_counts_match_registry():
    import gen_coverage_counts as g

    c = g.live_counts()
    import __spark_entry__ as e

    assert c["n_queries"] == len(e.queries())
    assert c["n_oracled"] == len(e.oracle_sql())

    for path, render in [
        (os.path.join(ROOT, "COVERAGE.md"), g.coverage_block(c)),
        (os.path.join(ROOT, "README.md"), g.readme_block(c)),
    ]:
        text = open(path).read()
        assert render in text, (
            f"{os.path.basename(path)} counts are stale — run "
            "python scripts/gen_coverage_counts.py"
        )
