"""The dashboard view-queries (reference `dashboards/app.py`) as short
DataFrame plans over the cached fact table."""
