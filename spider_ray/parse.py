"""HTML parse spec: title + link extraction.

Pure-stdlib (``html.parser``) replacement for the reference's
BeautifulSoup+lxml parse (crawler.py:157-172). Neither bs4 nor lxml is
available in this environment, so the spec is self-contained and shared by the
engine and the sequential oracle (SURVEY.md §7 hard-part 2). Semantics:

- ``title``: text content of the FIRST ``<title>`` element (entity references
  unescaped), or ``None`` when the document has no title tag
  (``getattr(soup.title, 'text', None)``, crawler.py:165-166). Cleanup when
  truthy: ``'\\n'`` removed, then ``.strip()`` (crawler.py:167-168).
- ``hrefs``: the ``href`` attribute of every ``<a>`` tag in document order;
  ``<a>`` tags without an href are skipped (the ``KeyError`` continue,
  crawler.py:153-154); a valueless ``href`` attribute yields ``""`` (bs4
  parity).
- ``body``: the full decoded response text verbatim (``response.text``,
  crawler.py:170) — this is the "extracted text" whose byte-identity per url
  is the per-row invariant (BASELINE.json input_hint).
"""

from __future__ import annotations

from html.parser import HTMLParser


class _Extractor(HTMLParser):
    """One-pass title + href collector."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self._title_parts: list[str] = []
        self._in_title = False
        self.title_found = False
        self.hrefs: list[str] = []

    def handle_starttag(self, tag: str, attrs: list[tuple[str, str | None]]) -> None:
        if tag == "a":
            for name, value in attrs:
                if name == "href":
                    self.hrefs.append(value if value is not None else "")
                    break  # first href attribute wins (bs4 attrs-dict parity)
        elif tag == "title" and not self.title_found:
            self._in_title = True
            self.title_found = True

    def handle_endtag(self, tag: str) -> None:
        if tag == "title":
            self._in_title = False

    def handle_data(self, data: str) -> None:
        if self._in_title:
            self._title_parts.append(data)

    @property
    def title(self) -> str | None:
        if not self.title_found:
            return None
        return "".join(self._title_parts)


def extract(html_text: str) -> tuple[str | None, list[str]]:
    """Parse one document → ``(title, hrefs)`` per the spec above.

    Title cleanup matches crawler.py:165-168 exactly: ``None`` stays ``None``,
    an empty-string title stays ``""`` (falsy → no cleanup applied), otherwise
    newlines removed then stripped.
    """
    p = _Extractor()
    p.feed(html_text)
    p.close()
    title = p.title
    if title:
        title = title.replace("\n", "").strip()
    return title, p.hrefs


def parse_page(html_bytes: bytes) -> tuple[str | None, str, list[str]]:
    """Full fetch-side parse: ``(title, body, hrefs)``.

    ``body`` is the decoded text verbatim (crawler.py:170 ``response.text``);
    the corpus stores utf-8 — decode errors are replaced, deterministically.
    """
    body = html_bytes.decode("utf-8", errors="replace")
    title, hrefs = extract(body)
    return title, body, hrefs
