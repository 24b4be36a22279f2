"""Small CSS-selector engine over a real DOM parse (stdlib-only).

Fills the jsoup-selector slot the tag+attribute regex subset left
thin (reference: web/.../link/impl/DomLinkExtractor.java and
importer/.../splitter/impl/DomSplitter.java use jsoup selectors):
``extract_links_dom`` / ``split_dom`` route any selector beyond a
bare element tag through this module. Supported grammar — the subset
a crawler config actually uses:

    tag            div
    class          .story            div.story.lead
    id             #main             a#primary
    attribute      [data-x]          a[rel=nofollow]   [href^=https]
    descendant     div.content a
    direct child   ul > li > a

Pseudo-classes (:nth-child, :not, ...) raise ValueError — loudly
unsupported rather than silently wrong.

Execution model: this is the SLOW PATH by design — a per-document
Python DOM build used inside Arrow-batched UDFs (the same slot the
reference's jsoup walk occupies). The hot crawl path keeps the
JVM-side regex subset for bare tags; plans only pay for a DOM when
the selector genuinely needs one.
"""

from __future__ import annotations

import re
from html.parser import HTMLParser

_VOID = {
    "area", "base", "br", "col", "embed", "hr", "img", "input",
    "link", "meta", "param", "source", "track", "wbr",
}

_SIMPLE_RX = re.compile(
    r"""
    (?P<tag>[a-zA-Z][\w-]*|\*)?
    (?P<rest>(?:[.#][\w-]+|\[[^\]]+\])*)
    $""",
    re.X,
)
_PART_RX = re.compile(r"[.#][\w-]+|\[[^\]]+\]")


class DomNode:
    """One element: tag, attrs, children (elements + text strings),
    document-order index, parent link."""

    __slots__ = ("tag", "attrs", "children", "parent", "order")

    def __init__(self, tag: str, attrs: dict, parent, order: int):
        self.tag = tag
        self.attrs = attrs
        self.children: list = []
        self.parent = parent
        self.order = order

    @property
    def classes(self) -> set:
        return set((self.attrs.get("class") or "").split())

    def outer_html(self) -> str:
        a = "".join(
            f' {k}="{v}"' if v is not None else f" {k}"
            for k, v in self.attrs.items()
        )
        if self.tag in _VOID:
            return f"<{self.tag}{a}>"
        inner = "".join(
            c.outer_html() if isinstance(c, DomNode) else c
            for c in self.children
        )
        return f"<{self.tag}{a}>{inner}</{self.tag}>"

    def text(self) -> str:
        return "".join(
            c.text() if isinstance(c, DomNode) else c
            for c in self.children
        )

    def walk(self):
        yield self
        for c in self.children:
            if isinstance(c, DomNode):
                yield from c.walk()


class _Builder(HTMLParser):
    """Tolerant tree builder: mismatched end tags pop to the nearest
    open match (ignored if none), void elements never open a scope."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=False)
        self.root = DomNode("#root", {}, None, -1)
        self.stack = [self.root]
        self.n = 0

    def handle_starttag(self, tag, attrs):
        node = DomNode(tag, dict(attrs), self.stack[-1], self.n)
        self.n += 1
        self.stack[-1].children.append(node)
        if tag not in _VOID:
            self.stack.append(node)

    def handle_startendtag(self, tag, attrs):
        node = DomNode(tag, dict(attrs), self.stack[-1], self.n)
        self.n += 1
        self.stack[-1].children.append(node)

    def handle_endtag(self, tag):
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].tag == tag:
                del self.stack[i:]
                return

    def handle_data(self, data):
        self.stack[-1].children.append(data)

    def handle_entityref(self, name):
        self.stack[-1].children.append(f"&{name};")

    def handle_charref(self, name):
        self.stack[-1].children.append(f"&#{name};")


def parse_html(html: str) -> DomNode:
    b = _Builder()
    b.feed(html or "")
    return b.root


def _parse_simple(part: str) -> dict:
    """One compound selector (no combinator) -> matcher spec."""
    if ":" in part:
        raise ValueError(
            f"unsupported pseudo-class in selector part {part!r} "
            "(tag/.class/#id/[attr] and descendant/child only)"
        )
    m = _SIMPLE_RX.match(part)
    if not m or (not m.group("tag") and not m.group("rest")):
        raise ValueError(f"unparseable selector part {part!r}")
    spec = {"tag": (m.group("tag") or "*").lower(), "classes": set(),
            "id": None, "attrs": []}
    for piece in _PART_RX.findall(m.group("rest") or ""):
        if piece.startswith("."):
            spec["classes"].add(piece[1:])
        elif piece.startswith("#"):
            spec["id"] = piece[1:]
        else:  # [attr], [attr=v], [attr^=v]
            body = piece[1:-1]
            am = re.match(r"([\w-]+)\s*(\^?=)?\s*(.*)$", body)
            if not am:
                raise ValueError(f"unparseable attribute selector {piece!r}")
            name, op, val = am.group(1), am.group(2), am.group(3)
            val = val.strip("\"'") if val else val
            spec["attrs"].append((name.lower(), op, val))
    return spec


def parse_selector(sel: str) -> list[tuple[str, dict]]:
    """'div.content > ul li' -> [(' ', div.content), ('>', ul),
    (' ', li)] — a right-anchored combinator chain."""
    toks = re.findall(r">|[^\s>]+", sel.strip())
    out: list[tuple[str, dict]] = []
    comb = " "
    for t in toks:
        if t == ">":
            if not out:
                raise ValueError(f"selector {sel!r} starts with '>'")
            comb = ">"
            continue
        out.append((comb, _parse_simple(t)))
        comb = " "
    if not out:
        raise ValueError("empty selector")
    return out


def _matches(node: DomNode, spec: dict) -> bool:
    if spec["tag"] != "*" and node.tag != spec["tag"]:
        return False
    if spec["id"] is not None and node.attrs.get("id") != spec["id"]:
        return False
    if spec["classes"] and not spec["classes"] <= node.classes:
        return False
    for name, op, val in spec["attrs"]:
        got = node.attrs.get(name)
        if got is None:
            return False
        if op == "=" and got != val:
            return False
        if op == "^=" and not (got or "").startswith(val):
            return False
    return True


def _chain_matches(node: DomNode, chain: list[tuple[str, dict]]) -> bool:
    """Right-to-left with backtracking (greedy nearest-ancestor would
    miss e.g. 'a > b c' when the nearest matching b lacks the direct-
    child a but a farther b has it). chain[i][0] is the combinator
    BETWEEN element i-1 and i."""

    def ok(cur: DomNode, i: int) -> bool:
        if not _matches(cur, chain[i][1]):
            return False
        if i == 0:
            return True
        comb = chain[i][0]
        p = cur.parent
        if comb == ">":
            return p is not None and p.tag != "#root" and ok(p, i - 1)
        while p is not None and p.tag != "#root":
            if ok(p, i - 1):
                return True
            p = p.parent
        return False

    return ok(node, len(chain) - 1)


def select(html: str, selector: str) -> list[DomNode]:
    """All elements matching ``selector``, in document order."""
    chain = parse_selector(selector)
    root = parse_html(html)
    return [n for n in root.walk()
            if n.tag != "#root" and _chain_matches(n, chain)]


def is_bare_tag(selector: str) -> bool:
    """True when the selector is a single element tag — the case the
    callers keep on the JVM-side regex fast path."""
    return bool(re.fullmatch(r"[a-zA-Z][\w-]*", selector.strip()))
