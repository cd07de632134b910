"""Error handling / observability (reference §2.11).

The reference wraps every search in ``searchAndPrintQueryOnError``
(lib/collectServicesFromSummaries.ts:327-335) and its catch blocks dump
the query with the hits blanked (:98-111, :304-318).  The Spark analog:
run the action; on failure, echo the logical/physical plan (the "query")
and re-raise — the result rows are never dumped, matching the reference's
hits-blanked behavior.
"""

from __future__ import annotations

import sys
from typing import Any, Callable

from pyspark.sql import DataFrame


def run_and_print_plan_on_error(
    df: DataFrame,
    action: Callable[[DataFrame], Any] = lambda d: d.collect(),
    log=lambda msg: print(msg, file=sys.stderr),
) -> Any:
    """Execute ``action(df)``; on failure echo the plan, then re-raise.

    Mirrors ``searchAndPrintQueryOnError``: the *query* is printed (here:
    the Catalyst plan, which is the engine's query IR), never the data.
    """
    try:
        return action(df)
    except Exception:
        log("=== query failed; plan echo (searchAndPrintQueryOnError analog) ===")
        try:
            log(df._jdf.queryExecution().toString())
        except Exception:  # plan printing must never mask the original error
            log("<plan unavailable>")
        raise
