"""Run configuration: the reference's ConfigController + CLI knobs surface.

Mirrors ``spider/controllers/config_controller.py:11-95`` (INI file with
``[DATABASE]`` and ``[INFRASTRUCTURE]`` sections, create-if-missing with
empty sections, ``set``/``update``/``is_config_section_empty``) and the
proxy-format validation of ``Crawler.__init__`` (crawler.py:39-47 →
``IncorrectProxyFormatError``, spider/crawler/exceptions.py:1-10).

In the Ray engine the "database" section configures the store sink (see
spider_ray.sinks) and the infrastructure section carries the politeness /
proxy knobs; the proxy itself is a no-op in corpus mode but its format is
validated eagerly with the same error semantics.
"""

from __future__ import annotations

import configparser
import os

DB_SECTION = "DATABASE"
INFRA_SECTION = "INFRASTRUCTURE"
DB_KEYS = ["type", "username", "password", "host", "name"]
INFRA_KEYS = ["proxy_host", "concurrency_limit"]


class IncorrectProxyFormatError(Exception):
    """Raised when the proxy host string is not a valid http(s) proxy URL
    (reference: httpx AsyncClient raising ValueError → re-raised as this,
    crawler.py:44-47)."""

    def __init__(self, proxy):
        super().__init__(f"Incorrect proxy format: {proxy!r}")


def validate_proxy(proxy: str | None) -> str | None:
    """Eager proxy-format check (quirk-faithful: the reference only accepts
    what httpx can parse into a proxy map — scheme://host[:port])."""
    if proxy is None or proxy is False:
        return None
    from urllib.parse import urlsplit

    s = urlsplit(str(proxy))
    if s.scheme not in ("http", "https") or not s.netloc:
        raise IncorrectProxyFormatError(proxy)
    return str(proxy)


class ConfigController:
    """INI-backed config with the reference's create-if-missing behavior."""

    def __init__(self, file_name: str = "config.ini", base_dir: str | None = None):
        self.file_name = file_name
        self.path = os.path.join(base_dir or os.getcwd(), file_name)
        self._cfg = configparser.ConfigParser()
        if os.path.exists(self.path):
            self._cfg.read(self.path)
        changed = False
        for section in (DB_SECTION, INFRA_SECTION):
            if not self._cfg.has_section(section):
                self._cfg.add_section(section)
                changed = True
        if changed or not os.path.exists(self.path):
            self._write()

    def _write(self) -> None:
        with open(self.path, "w") as f:
            self._cfg.write(f)

    def get_db_config(self, key: str) -> str | None:
        return self._cfg.get(DB_SECTION, key, fallback=None)

    def get_infrastructure_config(self, key: str) -> str | None:
        return self._cfg.get(INFRA_SECTION, key, fallback=None)

    def set_config(self, section: str, key: str, value: str) -> None:
        if not self._cfg.has_section(section):
            self._cfg.add_section(section)
        self._cfg.set(section, key, str(value))
        self._write()

    def update(self, values: dict[str, str]) -> None:
        """Persist CLI-provided credentials as new defaults
        (config_controller.py update path)."""
        for k, v in values.items():
            if v is None:
                continue
            section = DB_SECTION if k in DB_KEYS else INFRA_SECTION
            self.set_config(section, k, v)

    def is_config_section_empty(self, section: str) -> bool:
        return not any(
            v for _, v in self._cfg.items(section)
        ) if self._cfg.has_section(section) else True
