"""HTML text extraction — the pipeline stage between archive ingest
and the text battery.

A web-scale training pipeline reads WARC shards (``sources/warc.py``,
q196), extracts VISIBLE TEXT from the HTML payloads, then runs
quality/dedup/tokenize over that text (``operators/text.py``). This
module is that middle stage, built as a real single-pass tag
tokenizer (not regex-over-documents): quote-aware attribute scanning
(a ``>`` inside an attribute value does not close the tag), comment
and DOCTYPE skipping, raw-text elements (``script``/``style``/
``noscript``/``template``) excluded wholesale, ``<title>`` captured
separately from body text, character-entity decoding (named +
decimal + hex numeric), block-level elements flushing whitespace-
collapsed lines.

Everything is stdlib; the per-document cost is one C-speed ``find``
scan per tag plus one regex pass for entities, so the operator rides
the same embarrassingly-parallel Arrow map shape as the codecs.
"""

from __future__ import annotations

import re

_NAMED_ENTITIES = {
    "amp": "&", "lt": "<", "gt": ">", "quot": '"', "apos": "'",
    "nbsp": " ",
}
_ENTITY_RE = re.compile(r"&(#x[0-9a-fA-F]+|#[0-9]+|[a-zA-Z]+);")

# block-level elements: opening OR closing one of these ends the
# current text line (HTML living standard's flow-content blocks that
# matter for text extraction)
_BLOCK_TAGS = frozenset((
    "p", "div", "br", "hr", "li", "ul", "ol", "dl", "dt", "dd",
    "h1", "h2", "h3", "h4", "h5", "h6", "table", "tr", "td", "th",
    "thead", "tbody", "blockquote", "pre", "section", "article",
    "header", "footer", "nav", "aside", "main", "figure",
    "figcaption", "form", "fieldset", "body", "html", "head",
))
_RAWTEXT_TAGS = frozenset(("script", "style", "noscript", "template"))


def decode_entities(s: str) -> str:
    """Decode named, decimal, and hex character references."""
    def _one(m: "re.Match") -> str:
        ref = m.group(1)
        if ref.startswith("#x") or ref.startswith("#X"):
            try:
                return chr(int(ref[2:], 16))
            except (ValueError, OverflowError):
                return m.group(0)
        if ref.startswith("#"):
            try:
                return chr(int(ref[1:]))
            except (ValueError, OverflowError):
                return m.group(0)
        return _NAMED_ENTITIES.get(ref.lower(), m.group(0))

    return _ENTITY_RE.sub(_one, s)


def _parse_attrs(s: str) -> dict[str, str]:
    """Attribute string -> {name: value} (first occurrence wins),
    tolerating unquoted, single-, and double-quoted values."""
    attrs: dict[str, str] = {}
    i, n = 0, len(s)
    while i < n:
        while i < n and s[i] in " \t\r\n/":
            i += 1
        start = i
        while i < n and s[i] not in " \t\r\n=/>":
            i += 1
        name = s[start:i].lower()
        if not name:
            break
        while i < n and s[i] in " \t\r\n":
            i += 1
        value = ""
        if i < n and s[i] == "=":
            i += 1
            while i < n and s[i] in " \t\r\n":
                i += 1
            if i < n and s[i] in "\"'":
                q = s[i]
                end = s.find(q, i + 1)
                if end < 0:
                    end = n
                value = s[i + 1:end]
                i = end + 1
            else:
                start = i
                while i < n and s[i] not in " \t\r\n>":
                    i += 1
                value = s[start:i]
        attrs.setdefault(name, value)
    return attrs


def _find_tag_end(html: str, start: int) -> int:
    """Index of the ``>`` closing the tag opened at ``start`` ('<'),
    skipping over quoted attribute values (a '>' inside quotes does
    not close the tag). Returns len(html) if unterminated."""
    i, n = start + 1, len(html)
    while i < n:
        c = html[i]
        if c == ">":
            return i
        if c in "\"'":
            end = html.find(c, i + 1)
            if end < 0:
                return n
            i = end + 1
            continue
        i += 1
    return n


def html_extract(html: str) -> dict:
    """Single-pass extraction: returns ``{"title", "text",
    "n_links", "n_scripts"}`` where ``text`` is newline-joined
    whitespace-collapsed block lines of visible body text (raw-text
    elements excluded, entities decoded) and ``n_links`` counts
    ``<a>`` tags carrying an href attribute."""
    lines: list[str] = []
    buf: list[str] = []
    title_parts: list[str] = []
    in_title = False
    n_links = 0
    n_scripts = 0

    def _flush() -> None:
        if buf:
            line = " ".join(decode_entities("".join(buf)).split())
            buf.clear()
            if line:
                lines.append(line)

    i, n = 0, len(html)
    while i < n:
        lt = html.find("<", i)
        if lt < 0:
            (title_parts if in_title else buf).append(html[i:])
            break
        if lt > i:
            (title_parts if in_title else buf).append(html[i:lt])
        if html.startswith("<!--", lt):
            end = html.find("-->", lt + 4)
            i = n if end < 0 else end + 3
            continue
        if html.startswith("<!", lt) or html.startswith("<?", lt):
            end = html.find(">", lt)
            i = n if end < 0 else end + 1
            continue
        nxt = html[lt + 1:lt + 2]
        if not (nxt.isascii() and (nxt.isalpha() or nxt == "/")):
            # '<' not opening a tag is literal text; resume at the
            # NEXT char so real tags after it still parse (browsers'
            # "data state" behavior)
            (title_parts if in_title else buf).append("<")
            i = lt + 1
            continue
        gt = _find_tag_end(html, lt)
        tag = html[lt + 1:gt]
        i = min(gt + 1, n)
        closing = tag.startswith("/")
        if closing:
            tag = tag[1:]
        m = re.match(r"[a-zA-Z][a-zA-Z0-9:-]*", tag)
        if not m:
            continue  # '</' + non-letter: bogus comment, skipped to '>'
        name = m.group(0).lower()
        attr_str = tag[m.end():]
        if name == "title":
            _flush()
            in_title = not closing
            continue
        if not closing and name in _RAWTEXT_TAGS:
            if name == "script":
                n_scripts += 1
            close = re.search(
                rf"</{name}\b[^>]*>", html[i:], re.IGNORECASE
            )
            i = n if close is None else i + close.end()
            _flush()
            continue
        if not closing and name == "a":
            if "href" in _parse_attrs(attr_str):
                n_links += 1
        if name in _BLOCK_TAGS:
            _flush()
    _flush()
    return {
        "title": " ".join(decode_entities("".join(title_parts)).split()),
        "text": "\n".join(lines),
        "n_links": n_links,
        "n_scripts": n_scripts,
    }
