"""Guard against doc drift: the README's advertised registry counts must
match the live ``queries()`` / ``oracle_sql()`` registries (VERDICT r4
"What's wrong #3" — docs said 178/158 while the code exported 177/157)."""

import re
from pathlib import Path

import __ray_entry__ as entry

README = Path(__file__).resolve().parent.parent / "README.md"


def test_readme_counts_match_registry():
    text = README.read_text()
    m = re.search(r"\((\d+) operators, (\d+) with DuckDB oracles", text)
    assert m, "README no longer advertises registry counts — update this test"
    n_q, n_o = int(m.group(1)), int(m.group(2))
    assert n_q == len(entry.queries())
    assert n_o == len(entry.oracle_sql())


def test_every_oracle_key_has_a_query():
    q, o = entry.queries(), entry.oracle_sql()
    missing = sorted(set(o) - set(q))
    assert not missing, f"oracle_sql keys without queries(): {missing}"
