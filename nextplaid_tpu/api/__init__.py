"""REST API server (aiohttp) — reference: /root/reference/next-plaid-api."""

from nextplaid_tpu.api.server import build_app, main  # noqa: F401
from nextplaid_tpu.api.state import AppState  # noqa: F401
