"""Registry metadata hygiene: every registered query's docstring must
be fully substituted (no literal ``{CONSTANT}`` placeholders leaking
into help() output / Query.doc) — the modules that template constants
into docs use the ``fn.__doc__.replace`` pattern, and load_all
re-reads the live __doc__ after those patches ran.
"""

from __future__ import annotations

import re

from iot_sparkstreaming_spark.queries import registry


def test_no_unsubstituted_placeholders_in_docs() -> None:
    offenders = {}
    for name, q in registry.load_all().items():
        ph = re.findall(r"\{[A-Z][A-Z0-9_]*\}", q.doc or "")
        # ALL-CAPS {NAME} tokens are constant placeholders by house
        # convention; prose braces (set notation etc.) don't match.
        if ph:
            offenders[name] = sorted(set(ph))
    assert not offenders, offenders


def test_every_query_has_a_docstring() -> None:
    missing = [n for n, q in registry.load_all().items() if not (q.doc or "").strip()]
    assert not missing, missing
