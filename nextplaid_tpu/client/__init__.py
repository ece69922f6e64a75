"""Python SDK + CLI for the nextplaid_tpu REST API (reference:
/root/reference/next-plaid-api/python-sdk)."""

from nextplaid_tpu.client.async_client import AsyncNextPlaidClient  # noqa: F401
from nextplaid_tpu.client.client import NextPlaidClient  # noqa: F401
from nextplaid_tpu.client.exceptions import (  # noqa: F401
    IndexExistsError,
    IndexNotFoundError,
    NextPlaidClientError,
    ServerError,
    ValidationError,
)
