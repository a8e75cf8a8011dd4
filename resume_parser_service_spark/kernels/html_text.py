"""Deterministic HTML main-content extraction (boilerplate stripping).

Readability/trafilatura-style DOM-heuristic scoring per BASELINE.json
``north_star``: a tolerant tag tokenizer segments the page into text
blocks; blocks inside boilerplate containers (nav/header/footer/aside and
form/menu chrome) are dropped, as are high link-density blocks. No DOM
library — a single linear scan with an ancestor stack, so the kernel
vectorizes cleanly over Arrow batches of ``html:binary``.

Output contract (total, version-frozen; bump KERNEL_VERSION on change):
kept blocks are emitted in document order; within a block, whitespace
runs collapse to a single space and the block is stripped; blocks are
joined with "\n". Entities are decoded: numeric, the frozen core named
set, and the full HTML5 named table (stdlib data) as fallback.
"""

from __future__ import annotations

import re

__all__ = ["extract_html", "KERNEL_VERSION"]

KERNEL_VERSION = "html-1.4.0"

# Containers whose entire subtree is boilerplate.
_BOILERPLATE = {"nav", "header", "footer", "aside", "form", "menu",
                "script", "style", "noscript", "svg", "template", "head",
                "button", "select", "option", "iframe"}

# class/id tokens that mark a generic container (div/section/ul/table)
# as chrome — real pages predate/ignore semantic tags and ship
# <div class="nav"> instead of <nav> (readability/trafilatura's
# unlikelyCandidates heuristic).
_BOILER_HINT_RE = re.compile(
    r"""(?:class|id)\s*=\s*["']?[^"'>]*\b(?:nav(?:igation|bar)?|menu|
    footer|header|sidebar|side-bar|breadcrumb|banner|masthead|comment|
    share|social|advert(?:isement)?|sponsor|promo|cookie|popup|paywall|
    related|widget)\b""",
    re.I | re.X)

# generic BLOCK containers the class-hint applies to (hinted inline
# tags like <span> stay text — dropping them would split blocks)
_HINTABLE = {"div", "section", "ul", "ol", "table"}

# Tags that terminate the current text block.
_BLOCK_TAGS = {"p", "div", "article", "section", "main", "body", "html",
               "h1", "h2", "h3", "h4", "h5", "h6", "li", "ul", "ol",
               "table", "tr", "td", "th", "blockquote", "pre", "figure",
               "figcaption", "br", "hr", "dl", "dt", "dd"}

_RAWTEXT = {"script", "style", "noscript", "template"}

_TAG_RE = re.compile(r"<(/?)([a-zA-Z][a-zA-Z0-9:-]*)((?:[^>\"']|\"[^\"]*\"|'[^']*')*)>")
_ENTITIES = {"amp": "&", "lt": "<", "gt": ">", "quot": '"', "apos": "'",
             "nbsp": " ", "mdash": "—", "ndash": "–",
             "hellip": "…", "rsquo": "’", "lsquo": "‘",
             "ldquo": "“", "rdquo": "”", "copy": "©",
             "reg": "®", "trade": "™", "middot": "·",
             "bull": "•", "laquo": "«", "raquo": "»"}
# named entities may carry digits (&frac12; &sup1;) — [a-zA-Z]+ alone
# would never even look them up in the HTML5 table
_ENT_RE = re.compile(r"&(#x?[0-9a-fA-F]+|[a-zA-Z][a-zA-Z0-9]*);")
_WS_RE = re.compile(r"\s+")

# Extraction thresholds (frozen).
MIN_BLOCK_CHARS = 8
MAX_LINK_DENSITY = 0.5


_CHARSET_RE = re.compile(
    rb"""<meta[^>]+?(?:charset\s*=\s*["']?|content=["'][^"']*charset=)"""
    rb"""([A-Za-z0-9_\-]+)""", re.I)

_CHARSET_ALIASES = {"utf8": "utf-8", "iso-8859-1": "latin-1",
                    "windows-1252": "cp1252", "us-ascii": "ascii"}


def _decode(data: bytes) -> str:
    """Charset-aware decode: BOM, then UTF-8 strict, then the declared
    <meta charset>, then latin-1 (never fails). Deterministic."""
    if data[:3] == b"\xef\xbb\xbf":
        return data[3:].decode("utf-8", "replace")
    if data[:2] in (b"\xff\xfe", b"\xfe\xff"):
        return data.decode("utf-16", "replace")
    try:
        return data.decode("utf-8")
    except UnicodeDecodeError:
        pass
    m = _CHARSET_RE.search(data[:2048])
    if m:
        enc = m.group(1).decode("ascii", "replace").lower()
        enc = _CHARSET_ALIASES.get(enc, enc)
        try:
            return data.decode(enc, "replace")
        except LookupError:
            pass
    return data.decode("latin-1")


def _unescape(text: str) -> str:
    def sub(m: re.Match) -> str:
        e = m.group(1)
        if e.startswith("#"):
            try:
                code = int(e[2:], 16) if e[1] in "xX" else int(e[1:])
                return chr(code)
            except (ValueError, OverflowError):
                return m.group(0)
        got = _ENTITIES.get(e)
        if got is None:
            # full HTML5 named-entity table (stdlib, version-frozen
            # data): &eacute; &uuml; &szlig; ... — real crawls use them
            from html.entities import html5
            got = html5.get(e + ";")
        return got if got is not None else m.group(0)
    return _ENT_RE.sub(sub, text)


class _Block:
    __slots__ = ("parts", "link_chars", "boiler")

    def __init__(self, boiler: int):
        self.parts: list[str] = []
        self.link_chars = 0
        self.boiler = boiler

    def text(self) -> str:
        return _WS_RE.sub(" ", "".join(self.parts)).strip()


def extract_html(data: bytes) -> dict:
    """Extract main text + anchor hrefs from HTML bytes.

    Returns ``{"text": str, "links": list[str], "n_pages": int}`` —
    ``n_pages`` is always 1 (same shape as the PDF kernel, so the
    pipeline's mapInPandas schema is uniform).
    """
    html = _decode(data)
    blocks: list[_Block] = []
    links: list[str] = []
    boiler_depth = 0
    anchor_depth = 0
    tag_depth: dict[str, int] = {}   # open count per hintable tag
    hint_stack: list[tuple] = []     # (tag, depth-at-open) of hinted opens
    cur = _Block(0)
    pos = 0
    n = len(html)

    def flush():
        nonlocal cur
        if cur.parts:
            blocks.append(cur)
        cur = _Block(boiler_depth)

    while pos < n:
        lt = html.find("<", pos)
        if lt < 0:
            _append_text(cur, html[pos:], anchor_depth)
            break
        if lt > pos:
            _append_text(cur, html[pos:lt], anchor_depth)
        if html.startswith("<!--", lt):
            end = html.find("-->", lt + 4)
            pos = n if end < 0 else end + 3
            continue
        if html.startswith("<!", lt) or html.startswith("<?", lt):
            end = html.find(">", lt)
            pos = n if end < 0 else end + 1
            continue
        m = _TAG_RE.match(html, lt)
        if not m:
            _append_text(cur, "<", anchor_depth)
            pos = lt + 1
            continue
        closing, tag, attrs = m.group(1), m.group(2).lower(), m.group(3)
        pos = m.end()
        self_closing = attrs.rstrip().endswith("/")
        if not closing and tag in _RAWTEXT and not self_closing:
            end = re.search(rf"</{tag}\s*>", html[pos:], re.I)
            pos = n if end is None else pos + end.end()
            continue
        if tag in _BLOCK_TAGS:
            flush()
        if tag == "a":
            if closing:
                anchor_depth = max(0, anchor_depth - 1)
            else:
                anchor_depth += 1
                hm = re.search(r"""href\s*=\s*("([^"]*)"|'([^']*)'|([^\s>]+))""",
                               attrs, re.I)
                if hm:
                    href = hm.group(2) or hm.group(3) or hm.group(4) or ""
                    href = _unescape(href.strip())
                    if href and not href.startswith(("#", "javascript:")):
                        links.append(href)
        elif tag in _BOILERPLATE and not self_closing:
            flush()
            if closing:
                boiler_depth = max(0, boiler_depth - 1)
            else:
                boiler_depth += 1
            cur = _Block(boiler_depth)
        elif tag in ("article", "main") and not closing:
            # a semantic main-content container opening INSIDE a hinted
            # generic container means the hint mis-scoped (common with
            # never-closed chrome divs in crawled HTML): the readability
            # precedence is that <article>/<main> wins — drop all
            # hint-derived boiler (semantic _BOILERPLATE nesting like
            # <nav> is unaffected)
            if hint_stack:
                boiler_depth = max(0, boiler_depth - len(hint_stack))
                hint_stack.clear()
                flush()
                cur = _Block(boiler_depth)
        elif tag in _HINTABLE and not self_closing:
            # generic containers become boilerplate when their class/id
            # says chrome (<div class="navbar">); the matching close is
            # found by same-tag nesting depth, so unhinted inner divs
            # don't end the poisoned subtree early
            if not closing:
                tag_depth[tag] = tag_depth.get(tag, 0) + 1
                if _BOILER_HINT_RE.search(attrs):
                    flush()
                    hint_stack.append((tag, tag_depth[tag]))
                    boiler_depth += 1
                    cur = _Block(boiler_depth)
            else:
                d = tag_depth.get(tag, 0)
                # pop the exact match AND any abandoned deeper entries
                # (a close arriving at/below a recorded depth means that
                # hinted open can no longer be closed properly — without
                # this, one unbalanced div sticks boiler_depth forever
                # and the rest of the page extracts empty)
                while (hint_stack and hint_stack[-1][0] == tag
                        and hint_stack[-1][1] >= d):
                    hint_stack.pop()
                    boiler_depth = max(0, boiler_depth - 1)
                    flush()
                    cur = _Block(boiler_depth)
                tag_depth[tag] = max(0, d - 1)
    flush()

    kept: list[str] = []
    for b in blocks:
        t = b.text()
        if not t or b.boiler > 0:
            continue
        if len(t) < MIN_BLOCK_CHARS:
            continue
        if b.link_chars / max(1, len(t)) > MAX_LINK_DENSITY:
            continue
        kept.append(t)
    return {"text": "\n".join(kept), "links": links, "n_pages": 1}


def _append_text(block: _Block, raw: str, anchor_depth: int):
    if not raw:
        return
    txt = _unescape(raw)
    block.parts.append(txt)
    if anchor_depth > 0:
        block.link_chars += len(txt.strip())
