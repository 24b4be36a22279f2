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
    attribute      [data-x]          a[rel=nofollow]
      operators    [href^=https]  [src$=.png]  [alt*=cat]  [rel~=next]
    descendant     div.content a
    direct child   ul > li > a
    pseudo-class   :first-child  :last-child  :only-child
                   :nth-child(3)  :nth-child(even|odd|2n+1)
                   :first-of-type  :last-of-type  :empty
                   :not(<compound>)  :contains(text)   (jsoup-style,
                   case-insensitive own+descendant text)

Anything else (e.g. :has, sibling combinators) raises ValueError —
loudly unsupported rather than silently wrong.

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


_PSEUDO_RX = re.compile(r":([\w-]+)(?:\(([^)]*)\))?")

_KNOWN_PSEUDOS = {
    "first-child", "last-child", "only-child", "nth-child",
    "first-of-type", "last-of-type", "empty", "not", "contains",
}


def _parse_nth(arg: str):
    """nth-child argument -> predicate over a 1-based index."""
    a = arg.strip().lower()
    if a == "even":
        a = "2n"
    elif a == "odd":
        a = "2n+1"
    m = re.fullmatch(r"([+-]?\d*)n(\s*[+-]\s*\d+)?", a)
    if m:
        step = m.group(1)
        step = int(step) if step not in ("", "+", "-") else (
            -1 if step == "-" else 1
        )
        off = int(m.group(2).replace(" ", "")) if m.group(2) else 0
        if step == 0:
            return lambda i: i == off
        return lambda i: (i - off) % step == 0 and (i - off) // step >= 0
    if re.fullmatch(r"\d+", a):
        want = int(a)
        return lambda i: i == want
    raise ValueError(f"unparseable :nth-child argument {arg!r}")


def _split_pseudos(part: str) -> tuple[str, list]:
    """Strip :pseudo(...) pieces (outside [attr] brackets, so attr
    values may contain colons) and return (base, raw pseudo list)."""
    base: list[str] = []
    raw: list[tuple[str, str]] = []
    i = 0
    while i < len(part):
        ch = part[i]
        if ch == "[":
            j = part.find("]", i)
            j = len(part) - 1 if j < 0 else j
            base.append(part[i : j + 1])
            i = j + 1
        elif ch == ":":
            m = _PSEUDO_RX.match(part, i)
            if not m:
                raise ValueError(
                    f"unparseable pseudo-class in selector part {part!r}"
                )
            raw.append((m.group(1), m.group(2) or ""))
            i = m.end()
        else:
            base.append(ch)
            i += 1
    return "".join(base), raw


def _parse_simple(part: str) -> dict:
    """One compound selector (no combinator) -> matcher spec."""
    part, raw_pseudos = _split_pseudos(part)
    pseudos = []
    for name, arg in raw_pseudos:
        if name not in _KNOWN_PSEUDOS:
            raise ValueError(
                f"unsupported pseudo-class :{name} in selector part "
                f"{part!r}"
            )
        if name == "nth-child":
            pseudos.append(("nth-child", _parse_nth(arg or "")))
        elif name == "not":
            pseudos.append(("not", _parse_simple(arg.strip())))
        else:
            pseudos.append((name, arg))
    m = _SIMPLE_RX.match(part)
    if pseudos and not part:
        # bare ':first-child' — match any element
        return {"tag": "*", "classes": set(), "id": None, "attrs": [],
                "pseudos": pseudos}

    if not m or (not m.group("tag") and not m.group("rest")):
        raise ValueError(f"unparseable selector part {part!r}")
    spec = {"tag": (m.group("tag") or "*").lower(), "classes": set(),
            "id": None, "attrs": [], "pseudos": pseudos}
    for piece in _PART_RX.findall(m.group("rest") or ""):
        if piece.startswith("."):
            spec["classes"].add(piece[1:])
        elif piece.startswith("#"):
            spec["id"] = piece[1:]
        else:  # [attr], [attr=v], [attr^=v] and $= *= ~= variants
            body = piece[1:-1]
            am = re.match(r"([\w-]+)\s*([\^$*~]?=)?\s*(.*)$", body)
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


def _elem_siblings(node: DomNode) -> list:
    if node.parent is None:
        return [node]
    return [c for c in node.parent.children if isinstance(c, DomNode)]


def _pseudo_matches(node: DomNode, name: str, arg) -> bool:
    sibs = _elem_siblings(node)
    if name == "first-child":
        return sibs[0] is node
    if name == "last-child":
        return sibs[-1] is node
    if name == "only-child":
        return len(sibs) == 1
    if name == "nth-child":
        return arg(sibs.index(node) + 1)
    if name == "first-of-type":
        same = [s for s in sibs if s.tag == node.tag]
        return same[0] is node
    if name == "last-of-type":
        same = [s for s in sibs if s.tag == node.tag]
        return same[-1] is node
    if name == "empty":
        return not any(
            isinstance(c, DomNode)
            or (isinstance(c, str) and c.strip())
            for c in node.children
        )
    if name == "not":
        return not _matches(node, arg)
    if name == "contains":
        return str(arg).strip("\"'").lower() in node.text().lower()
    raise ValueError(f"unsupported pseudo-class :{name}")


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
        got = got or ""
        if op == "=" and got != val:
            return False
        if op == "^=" and not got.startswith(val):
            return False
        if op == "$=" and not got.endswith(val):
            return False
        if op == "*=" and val not in got:
            return False
        if op == "~=" and val not in got.split():
            return False
    return all(
        _pseudo_matches(node, name, arg)
        for name, arg in spec.get("pseudos", ())
    )


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
