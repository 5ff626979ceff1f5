"""External data sources: file formats, HTTP fetch shim, multimodal columns."""
