"""Stdlib HTML DOM with XPath- and CSS-subset evaluation.

Pure Python, zero third-party deps (the sandbox has no lxml /
HtmlAgilityPack analog) — designed to run INSIDE Arrow-batched pandas
UDFs, one parse per page, never per-field. The public entry points are
``parse_html`` plus the evaluators ``xpath_all`` / ``css_all`` and the
value extractor ``node_value``.

Reference semantics reproduced (reimplemented, not ported):

- ``XPathSelector`` (Extraction/XPathSelector.cs:13-99): a trailing
  ``/@attr`` selects the attribute value, trimmed; whitespace-only attr
  values are skipped (SelectList) / yield null (Select).
- ``CssSelector`` (Extraction/CssSelector.cs:41-87): ``QuerySelectorAll``
  document-order matches; optional attr name extracts the trimmed value.
- ``ValueOption`` (AbstractSelectable.cs:140-188): a node's default value
  is its InnerHtml; OuterHtml / InnerText on request.
- ``Selectable.Links()`` (Selectable.cs:119-139): descendant-or-self
  @href + @src values.

Supported XPath subset (covers every expression in the reference's
samples and tests): absolute ``//x`` ``/x``, relative ``.`` ``./x``
``.//x``, name test or ``*``, ``text()``, final ``@attr``, axes
``descendant-or-self::``, predicates ``[N]`` ``[last()]`` ``[@a]``
``[@a='v']`` ``[contains(@a,'v')]`` ``[not(...)]`` (combined, in order).

Supported CSS subset: groups ``,``; combinators descendant (space) and
child (``>``); compound simple selectors ``tag``, ``.class``, ``#id``,
``[attr]``, ``[attr=v]``, ``[attr*=v]``, ``[attr^=v]``, ``[attr$=v]``.
"""

from __future__ import annotations

import re
from html import escape
from html.parser import HTMLParser

_VOID = frozenset(
    "area base br col embed hr img input link meta param source track wbr".split()
)

# tags whose open implicitly closes a same-tag ancestor (the common
# forgiving-parser cases; enough for real-web crawl content)
_IMPLICIT_CLOSE = {
    "li": {"li"},
    "tr": {"tr", "td", "th"},
    "td": {"td", "th"},
    "th": {"td", "th"},
    "option": {"option"},
    "p": {"p"},
}


class Node:
    """One element node. ``children`` holds Nodes and text strings."""

    __slots__ = ("tag", "attrs", "children", "parent")

    def __init__(self, tag: str, attrs: dict[str, str], parent: "Node | None"):
        self.tag = tag
        self.attrs = attrs
        self.children: list[Node | str] = []
        self.parent = parent

    # ------------------------------------------------------------ values

    @property
    def inner_html(self) -> str:
        return "".join(
            c.outer_html if isinstance(c, Node) else escape(c, quote=False)
            for c in self.children
        )

    @property
    def outer_html(self) -> str:
        if self.tag == "#document":
            return self.inner_html
        attrs = "".join(
            f' {k}' if v is None else f' {k}="{escape(v)}"'
            for k, v in self.attrs.items()
        )
        if self.tag in _VOID and not self.children:
            return f"<{self.tag}{attrs}>"
        return f"<{self.tag}{attrs}>{self.inner_html}</{self.tag}>"

    @property
    def inner_text(self) -> str:
        out: list[str] = []

        def walk(n: Node) -> None:
            for c in n.children:
                if isinstance(c, Node):
                    walk(c)
                else:
                    out.append(c)

        walk(self)
        return "".join(out)

    # -------------------------------------------------------- navigation

    def element_children(self) -> list["Node"]:
        return [c for c in self.children if isinstance(c, Node)]

    def descendants(self, and_self: bool = False):
        """Element descendants in document order."""
        if and_self and self.tag != "#document":
            yield self
        stack = [c for c in reversed(self.children) if isinstance(c, Node)]
        while stack:
            n = stack.pop()
            yield n
            stack.extend(c for c in reversed(n.children) if isinstance(c, Node))

    def __repr__(self) -> str:  # debugging aid only
        return f"<Node {self.tag} {self.attrs}>"


class _TreeBuilder(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.root = Node("#document", {}, None)
        self.stack: list[Node] = [self.root]

    def handle_starttag(self, tag, attrs):
        closes = _IMPLICIT_CLOSE.get(tag)
        if closes:
            # pop the nearest same-group open element, if directly open
            for i in range(len(self.stack) - 1, 0, -1):
                if self.stack[i].tag in closes:
                    del self.stack[i:]
                    break
                if self.stack[i].tag in ("div", "table", "ul", "ol", "section"):
                    break
        # first occurrence of an attribute wins (duplicate attrs are rare
        # malformed input; HtmlAgilityPack keeps the first too)
        d: dict[str, str] = {}
        for k, v in attrs:
            if k not in d:
                d[k] = v
        node = Node(tag, d, self.stack[-1])
        self.stack[-1].children.append(node)
        if tag not in _VOID:
            self.stack.append(node)

    def handle_startendtag(self, tag, attrs):
        d: dict[str, str] = {}
        for k, v in attrs:
            if k not in d:
                d[k] = v
        self.stack[-1].children.append(Node(tag, d, self.stack[-1]))

    def handle_endtag(self, tag):
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].tag == tag:
                del self.stack[i:]
                return
        # stray end tag: ignore

    def handle_data(self, data):
        if data:
            self.stack[-1].children.append(data)


def parse_html(html: str | None) -> Node:
    """Parse (forgivingly) into a document node; empty doc on None/garbage."""
    b = _TreeBuilder()
    if html:
        try:
            b.feed(html)
            b.close()
        except Exception:
            pass  # keep whatever parsed
    return b.root


# ============================================================== XPath


class _Step:
    __slots__ = ("axis", "name", "preds")

    def __init__(self, axis: str, name: str, preds: list[str]):
        self.axis = axis  # 'child' | 'descendant' | 'descendant-or-self' | 'self'
        self.name = name  # tag name | '*' | 'text()' | '@attr'
        self.preds = preds


_PRED_RE = re.compile(r"\[([^\]]*)\]")


def _split_steps(path: str) -> list[tuple[str, str]]:
    """Split on / and // outside predicates -> [(axis_sep, step_text)]."""
    out: list[tuple[str, str]] = []
    i, n = 0, len(path)
    sep = ""
    buf: list[str] = []
    depth = 0
    while i < n:
        ch = path[i]
        if ch == "[":
            depth += 1
        elif ch == "]":
            depth -= 1
        if ch == "/" and depth == 0:
            if buf or sep:
                out.append((sep, "".join(buf)))
            if i + 1 < n and path[i + 1] == "/":
                sep = "//"
                i += 2
            else:
                sep = "/"
                i += 1
            buf = []
            continue
        buf.append(ch)
        i += 1
    out.append((sep, "".join(buf)))
    return out


def _parse_xpath(xpath: str) -> tuple[list[_Step], bool]:
    """-> (steps, absolute). Mirrors XPathSelector.cs:24-29 for /@attr."""
    xpath = xpath.strip()
    absolute = not xpath.startswith(".")
    if xpath.startswith("."):
        xpath = xpath[1:]
    steps: list[_Step] = []
    for sep, text in _split_steps(xpath):
        text = text.strip()
        if not text:
            continue
        # the // abbreviation is NOT the descendant:: axis: //x[1] means
        # /descendant-or-self::node()/child::x[1] — positional predicates
        # count within each parent — while descendant::x[1] is the flat
        # first descendant. Track the abbreviation distinctly.
        axis = "descendant-abbrev" if sep == "//" else "child"
        if text.startswith("descendant-or-self::"):
            axis = "descendant-or-self"
            text = text[len("descendant-or-self::") :]
        elif text.startswith("self::"):
            axis = "self"
            text = text[len("self::") :]
        elif text.startswith("child::"):
            text = text[len("child::") :]
        elif text.startswith("descendant::"):
            axis = "descendant"
            text = text[len("descendant::") :]
        preds = _PRED_RE.findall(text)
        name = _PRED_RE.sub("", text).strip()
        steps.append(_Step(axis, name, preds))
    return steps, absolute


_CMP_RE = re.compile(r"""^@([\w:-]+)\s*=\s*['"](.*)['"]$""")
_CONTAINS_RE = re.compile(
    r"""^contains\(\s*@([\w:-]+)\s*,\s*['"](.*)['"]\s*\)$"""
)
_TEXT_EQ_RE = re.compile(r"""^text\(\)\s*=\s*['"](.*)['"]$""")


def _pred_match(n: Node, pred: str) -> bool | None:
    """Non-positional predicate; None = positional (handled by caller)."""
    pred = pred.strip()
    if pred.isdigit() or pred == "last()":
        return None
    neg = False
    if pred.startswith("not(") and pred.endswith(")"):
        neg = True
        pred = pred[4:-1].strip()
    m = _CMP_RE.match(pred)
    if m:
        ok = n.attrs.get(m.group(1)) == m.group(2)
    else:
        m = _CONTAINS_RE.match(pred)
        if m:
            v = n.attrs.get(m.group(1))
            ok = v is not None and m.group(2) in v
        else:
            m = _TEXT_EQ_RE.match(pred)
            if m:
                ok = n.inner_text == m.group(1)
            elif pred.startswith("@"):
                ok = pred[1:] in n.attrs
            else:
                # unsupported predicate: fail closed (select nothing)
                ok = False
    return not ok if neg else ok


def _apply_preds(nodes: list[Node], preds: list[str]) -> list[Node]:
    for pred in preds:
        p = pred.strip()
        if p.isdigit():
            i = int(p)
            nodes = [nodes[i - 1]] if 1 <= i <= len(nodes) else []
        elif p == "last()":
            nodes = nodes[-1:] if nodes else []
        else:
            nodes = [n for n in nodes if _pred_match(n, p)]
    return nodes


def xpath_all(context: Node, xpath: str) -> list[Node | str]:
    """All matches in document order. Nodes for element steps; strings
    for ``@attr`` (trimmed, whitespace-skipped — XPathSelector.cs:70-85)
    and ``text()`` steps."""
    steps, absolute = _parse_xpath(xpath)
    if absolute:
        root = context
        while root.parent is not None:
            root = root.parent
        ctx = [root]
    else:
        ctx = [context]
    if not steps:
        return list(ctx)

    for si, step in enumerate(steps):
        is_last = si == len(steps) - 1
        if step.name.startswith("@"):
            if not is_last:
                return []  # attr must be the final step in this subset
            attr = step.name[1:]
            out: list[str] = []
            for n in ctx:
                v = n.attrs.get(attr)
                if v is not None and v.strip():
                    out.append(v.strip())
            return out
        if step.name == "text()":
            if not is_last:
                return []
            texts: list[str] = []
            for n in ctx:
                texts.extend(c for c in n.children if isinstance(c, str) and c)
            return texts

        has_positional = any(
            p.strip().isdigit() or p.strip() == "last()" for p in step.preds
        )
        nxt: list[Node] = []
        seen: set[int] = set()
        for n in ctx:
            if step.axis == "child":
                cand = [
                    c
                    for c in n.element_children()
                    if step.name == "*" or c.tag == step.name
                ]
            elif step.axis == "self":
                cand = [n] if (step.name == "*" or n.tag == step.name) else []
            else:  # descendant axes (incl. the // abbreviation)
                and_self = step.axis == "descendant-or-self"
                cand = [
                    d
                    for d in n.descendants(and_self=and_self)
                    if step.name == "*" or d.tag == step.name
                ]
            if step.axis == "descendant-abbrev" and has_positional:
                # //x[N] == /descendant-or-self::node()/child::x[N]:
                # positional predicates count within EACH parent's
                # matching children, not over the flat descendant list
                order = {id(c): k for k, c in enumerate(cand)}
                groups: dict[int, list[Node]] = {}
                for c in cand:
                    groups.setdefault(id(c.parent), []).append(c)
                picked: list[Node] = []
                for g in groups.values():
                    picked.extend(_apply_preds(g, step.preds))
                selected = sorted(picked, key=lambda c: order[id(c)])
            else:
                # predicates apply per context node along the axis
                selected = _apply_preds(cand, step.preds)
            for c in selected:
                if id(c) not in seen:
                    seen.add(id(c))
                    nxt.append(c)
        ctx = nxt
        if not ctx:
            return []
    return list(ctx)


# ================================================================ CSS


class _Simple:
    __slots__ = ("tag", "classes", "ident", "attrs")

    def __init__(self) -> None:
        self.tag: str | None = None
        self.classes: list[str] = []
        self.ident: str | None = None
        self.attrs: list[tuple[str, str, str | None]] = []  # (name, op, val)


_CSS_TOKEN_RE = re.compile(
    r"""([.#]?[\w:-]+|\*|\[[^\]]*\])"""
)
_CSS_ATTR_RE = re.compile(
    r"""^\[\s*([\w:-]+)\s*(?:([*^$|~]?=)\s*['"]?([^'"\]]*)['"]?\s*)?\]$"""
)


def _parse_simple(text: str) -> _Simple:
    s = _Simple()
    for tok in _CSS_TOKEN_RE.findall(text):
        if tok.startswith("."):
            s.classes.append(tok[1:])
        elif tok.startswith("#"):
            s.ident = tok[1:]
        elif tok.startswith("["):
            m = _CSS_ATTR_RE.match(tok)
            if m:
                s.attrs.append((m.group(1), m.group(2) or "", m.group(3)))
        elif tok == "*":
            s.tag = None
        else:
            s.tag = tok.lower()
    return s


def _simple_match(n: Node, s: _Simple) -> bool:
    if s.tag is not None and n.tag != s.tag:
        return False
    if s.ident is not None and n.attrs.get("id") != s.ident:
        return False
    if s.classes:
        have = (n.attrs.get("class") or "").split()
        if any(c not in have for c in s.classes):
            return False
    for name, op, val in s.attrs:
        if name not in n.attrs:
            return False
        # presence test [attr]: valueless attributes (<input disabled>)
        # parse with value None and must still match
        v = n.attrs.get(name)
        if op == "" or op is None:
            continue
        if v is None:
            return False
        if op == "=" and v != val:
            return False
        if op == "*=" and (val or "") not in v:
            return False
        if op == "^=" and not v.startswith(val or ""):
            return False
        if op == "$=" and not v.endswith(val or ""):
            return False
        if op == "~=" and (val or "") not in v.split():
            return False
    return True


def _parse_css(selector: str) -> list[list[tuple[str, _Simple]]]:
    """-> groups of (combinator, simple); combinator '' first, then
    ' ' (descendant) or '>' (child)."""
    groups = []
    for part in selector.split(","):
        part = part.strip()
        if not part:
            continue
        # normalize '>' spacing then split into tokens
        part = re.sub(r"\s*>\s*", " > ", part)
        toks = part.split()
        chain: list[tuple[str, _Simple]] = []
        comb = ""
        for t in toks:
            if t == ">":
                comb = ">"
                continue
            chain.append((comb, _parse_simple(t)))
            comb = " "
        if chain:
            groups.append(chain)
    return groups


def css_all(context: Node, selector: str) -> list[Node]:
    """QuerySelectorAll: document-order matches within ``context``."""
    groups = _parse_css(selector)
    out: list[Node] = []
    seen: set[int] = set()
    for n in context.descendants(and_self=context.tag != "#document"):
        for chain in groups:
            if _css_match_chain(n, chain, context):
                if id(n) not in seen:
                    seen.add(id(n))
                    out.append(n)
                break
    return out


def _css_match_chain(
    n: Node, chain: list[tuple[str, _Simple]], scope: Node
) -> bool:
    comb, simple = chain[-1]
    if not _simple_match(n, simple):
        return False
    if len(chain) == 1:
        return True
    rest = chain[:-1]
    if comb == ">":
        p = n.parent
        return p is not None and p is not scope.parent and _css_match_chain(p, rest, scope)
    # descendant: any ancestor up to (not beyond) the scope root
    p = n.parent
    while p is not None:
        if _css_match_chain(p, rest, scope):
            return True
        if p is scope:
            break
        p = p.parent
    return False


# ===================================================== value extraction


def node_value(item: Node | str | None, option: str = "auto") -> str | None:
    """ValueOption semantics (AbstractSelectable.cs:140-188): a Node's
    default value is InnerHtml; strings pass through."""
    if item is None:
        return None
    if isinstance(item, str):
        return item
    if option == "outer_html":
        return item.outer_html
    if option == "inner_text":
        return item.inner_text
    return item.inner_html  # 'auto' and 'inner_html'


def links(nodes: list[Node | str]) -> list[str]:
    """Selectable.Links() over already-selected nodes (Selectable.cs:
    119-139): descendant-or-self @href + @src, deduped, order kept."""
    hrefs: list[str] = []
    srcs: list[str] = []
    for n in nodes:
        if not isinstance(n, Node):
            continue
        for d in n.descendants(and_self=True):
            h = d.attrs.get("href")
            if h is not None and h.strip():
                hrefs.append(h.strip())
            s = d.attrs.get("src")
            if s is not None and s.strip():
                srcs.append(s.strip())
    out: list[str] = []
    seen: set[str] = set()
    for u in hrefs + srcs:
        if u not in seen:
            seen.add(u)
            out.append(u)
    return out
