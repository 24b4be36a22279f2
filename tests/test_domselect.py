"""CSS selector engine: pseudo-classes, attribute operators, and the
loud-failure contract for anything outside the supported grammar
(jsoup-selector slot of DomLinkExtractor.java / DomSplitter.java)."""

import pytest

from crawlspark.functions.domselect import select

DOC = """
<html><body>
  <ul id="menu">
    <li class="first">one</li>
    <li>two</li>
    <li>three</li>
    <li class="last">four</li>
  </ul>
  <div class="content">
    <p>alpha text</p>
    <span>inline</span>
    <p>beta text</p>
    <p></p>
  </div>
  <a href="https://x/a.png" rel="nofollow external">png link</a>
  <a href="http://y/b.jpg" rel="next">jpg link</a>
</body></html>
"""


def _texts(sel):
    return [n.text() for n in select(DOC, sel)]


def test_child_position_pseudos():
    assert _texts("li:first-child") == ["one"]
    assert _texts("li:last-child") == ["four"]
    assert _texts("li:nth-child(2)") == ["two"]
    assert _texts("li:nth-child(odd)") == ["one", "three"]
    assert _texts("li:nth-child(even)") == ["two", "four"]
    assert _texts("li:nth-child(2n+1)") == ["one", "three"]
    assert _texts("ul > li:nth-child(3)") == ["three"]
    assert select(DOC, "ul:only-child") == []


def test_of_type_and_empty():
    # spans interleave the p's: of-type ignores them
    assert _texts("div p:first-of-type") == ["alpha text"]
    assert _texts("div p:last-of-type") == [""]
    assert _texts("div p:empty") == [""]


def test_not_and_contains():
    assert _texts("li:not(.first):not(.last)") == ["two", "three"]
    assert _texts("p:contains(beta)") == ["beta text"]
    assert _texts("p:contains(BETA)") == ["beta text"]  # case-insens.
    assert _texts("div :not(p)") == ["inline"]


def test_attribute_operators():
    assert _texts("a[href$=.png]") == ["png link"]
    assert _texts("a[href*=//y/]") == ["jpg link"]
    assert _texts("a[rel~=external]") == ["png link"]
    assert _texts("a[href^=https]") == ["png link"]
    # colon inside an attribute value must not parse as a pseudo
    assert _texts("a[href^=https://x]") == ["png link"]


def test_unsupported_is_loud():
    with pytest.raises(ValueError, match="unsupported pseudo-class"):
        select(DOC, "li:has(a)")
    with pytest.raises(ValueError, match="nth-child"):
        select(DOC, "li:nth-child(x)")
