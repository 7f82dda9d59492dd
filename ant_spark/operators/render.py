"""Render stage — the antcdp seam (SURVEY.md §2.1 S4), Spark-first.

The reference renders JS pages by swapping a chrome-backed client into the
fetcher (``/root/reference/antcdp/client.go:1-20``: ``ant.Client`` whose
``Do`` navigates a CDP target and returns the RENDERED response,
``tx.go:23-120``); scraping then sees the post-execution DOM, so
JS-injected links enter the frontier like static ones.

Spark re-expression: a renderer is an Arrow-batched binary→binary kernel
applied to fetched html BETWEEN the fetch join and the parse UDF
(``CrawlConfig.render_fn``, optionally gated per-row by
``CrawlConfig.render_when``). The engine plan shape is unchanged — one
extra vectorized UDF in the already-Python parse stage, never a second
fetch pass.

Kernels:

- ``fake_js_renderer`` — deterministic sandbox stand-in: executes the
  ``document.write('...')`` subset by splicing the written markup into the
  DOM (and drops remaining script bodies, as a real render leaves no
  script-source text behind). Enough to golden-test the semantics that
  matter: a link that exists only after JS execution IS crawled with
  rendering on and ISN'T with it off.
- ``cdp_renderer`` — the real-chrome kernel boundary: raises
  NotImplementedError naming the dependency (a chrome instance + devtools
  websocket transport; neither exists in this container). Swap in any
  callable with the same signature to use a real renderer — the engine
  does not care what runs inside the batch kernel.
"""

from __future__ import annotations

import re
from typing import Callable

from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import BinaryType

_DOCWRITE_RE = re.compile(
    rb"<script[^>]*>\s*document\.write\(\s*(['\"])(.*?)\1\s*\)\s*;?\s*</script>",
    re.IGNORECASE | re.DOTALL,
)
_SCRIPT_RE = re.compile(rb"<script[^>]*>.*?</script>", re.IGNORECASE | re.DOTALL)


def fake_js_renderer(html: "bytes | None") -> "bytes | None":
    """Execute the document.write subset; strip remaining scripts."""
    if html is None:
        return None
    out = _DOCWRITE_RE.sub(lambda m: m.group(2), html)
    return _SCRIPT_RE.sub(b"", out)


def cdp_renderer(html: "bytes | None") -> "bytes | None":
    """The real-chrome seam (antcdp/client.go, tx.go:23-120)."""
    raise NotImplementedError(
        "chrome CDP rendering needs a running chrome + devtools websocket "
        "transport (reference antcdp/client.go) — neither exists in this "
        "container. Plug any bytes->bytes callable into "
        "CrawlConfig.render_fn; the engine-side seam is identical."
    )


def make_render_udf(render_fn: Callable) -> Callable:
    """Wrap a bytes→bytes kernel as an Arrow-batched binary column UDF."""

    @pandas_udf(BinaryType())
    def _render(html):  # pd.Series[bytes|None] -> pd.Series
        return html.map(lambda b: render_fn(b) if b is not None else None)

    return _render
