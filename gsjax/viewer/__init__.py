"""SIBR remote-viewer TCP bridge."""

from gsjax.viewer.network_gui import ViewerBridge

__all__ = ["ViewerBridge"]
