from kai0_client.action_chunk_broker import ActionChunkBroker
from kai0_client.base_policy import BasePolicy
from kai0_client.websocket_client_policy import WebsocketClientPolicy

__all__ = ["ActionChunkBroker", "BasePolicy", "WebsocketClientPolicy"]
