"""Control plane: REST + WebSocket API (stdlib asyncio implementation)."""
