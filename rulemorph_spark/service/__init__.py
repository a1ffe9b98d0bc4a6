"""Service surface: HTTP-style endpoint engine and MCP stdio server.

Driver-side layers over the compiled rule engine — the only remote hop
is the outbound network call in network rules, mirroring the reference
(``crates/rulemorph_endpoint``, ``crates/rulemorph_mcp``).
"""

from .endpoint import EndpointEngine, EndpointError
from .record import transform_record

__all__ = ["EndpointEngine", "EndpointError", "transform_record"]
