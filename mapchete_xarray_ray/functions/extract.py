"""Deterministic HTML -> text extraction kernel.

The north rule requires byte-identical extracted text per url versus
the reference extractor. There is no reference extractor in
mapchete_xarray (its payload is raster tiles), so THIS kernel is the
single source of truth: the sequential oracle (tests) and the Ray
engine stage both call :func:`extract_text` — byte-identity under
parallel execution follows from sharing one pure, order-independent
function keyed only on the html bytes.

Extraction semantics (fixed, documented, exactly specified):

1. decode bytes as UTF-8 (``errors="replace"``);
2. drop ``<script>...</script>``, ``<style>...</style>`` and
   ``<!-- ... -->`` blocks entirely (case-insensitive, non-greedy);
3. replace every remaining tag with a single space; block-level
   closing tags (``</p> </div> </h1..6> </li> </tr> </title> <br>``)
   with a newline;
4. unescape the five core HTML entities plus decimal/hex numeric
   references;
5. collapse runs of spaces/tabs to one space, strip spaces around
   newlines, collapse 3+ newlines to two, strip leading/trailing
   whitespace.

All steps are compiled-regex passes over the whole document — no
per-character Python loop. The compiled patterns are module-level so
actor/task workers compile them once per process import.
"""

from __future__ import annotations

import re

_SCRIPT_RE = re.compile(r"<(script|style)\b.*?</\1\s*>", re.IGNORECASE | re.DOTALL)
_COMMENT_RE = re.compile(r"<!--.*?-->", re.DOTALL)
_BLOCK_CLOSE_RE = re.compile(
    r"</(?:p|div|h[1-6]|li|tr|title|ul|ol|table|blockquote|section|article|header|footer)\s*>"
    r"|<br\s*/?>",
    re.IGNORECASE,
)
_TAG_RE = re.compile(r"<[^>]*>")
_DEC_ENT_RE = re.compile(r"&#(\d+);")
_HEX_ENT_RE = re.compile(r"&#x([0-9a-fA-F]+);")
_SPACE_RUN_RE = re.compile(r"[ \t\r\f\v]+")
_SPACE_NL_RE = re.compile(r" ?\n ?")
_NL_RUN_RE = re.compile(r"\n{3,}")

_NAMED = {"&amp;": "&", "&lt;": "<", "&gt;": ">", "&quot;": '"', "&#39;": "'", "&apos;": "'", "&nbsp;": " "}
_NAMED_RE = re.compile("|".join(re.escape(k) for k in _NAMED))


def extract_text(html: bytes | str) -> str:
    """Extract plain text from an HTML document. Pure and deterministic."""
    if isinstance(html, bytes):
        html = html.decode("utf-8", errors="replace")
    s = _SCRIPT_RE.sub(" ", html)
    s = _COMMENT_RE.sub(" ", s)
    s = _BLOCK_CLOSE_RE.sub("\n", s)
    s = _TAG_RE.sub(" ", s)
    s = _NAMED_RE.sub(lambda m: _NAMED[m.group(0)], s)
    s = _DEC_ENT_RE.sub(lambda m: chr(int(m.group(1))), s)
    s = _HEX_ENT_RE.sub(lambda m: chr(int(m.group(1), 16)), s)
    s = _SPACE_RUN_RE.sub(" ", s)
    s = _SPACE_NL_RE.sub("\n", s)
    s = _NL_RUN_RE.sub("\n\n", s)
    return s.strip()
