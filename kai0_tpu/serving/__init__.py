"""Serving layer. Depends on the kai0-client package for the wire codec.

When kai0-client is not pip-installed (dev checkouts), fall back to the in-repo
package source at ``packages/kai0-client/src``.
"""

try:  # noqa: SIM105
    import kai0_client  # noqa: F401
except ImportError:  # dev checkout: add the in-repo client package to sys.path
    import pathlib
    import sys

    _client_src = pathlib.Path(__file__).resolve().parents[2] / "packages" / "kai0-client" / "src"
    if _client_src.exists():
        sys.path.insert(0, str(_client_src))
    del pathlib, sys
