"""Small text-cleaning helpers used by the caption exporters.

The reference uses textacy.preprocessing.remove.html_tags
(xclip/datasets.py:1150); this is a dependency-free equivalent."""

from __future__ import annotations

import html
import re

_TAG_RE = re.compile(r"<[^>]+>")


def remove_html_tags(text: str) -> str:
    return _TAG_RE.sub("", text)


def unescape_html(text: str) -> str:
    return html.unescape(text)


def normalize_whitespace(text: str) -> str:
    return " ".join(text.split())
