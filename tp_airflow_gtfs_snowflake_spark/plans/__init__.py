"""Query plans: GTFS KPI layer (kpis.py) and the driver-table query
registry (driver_queries.py) backing __spark_entry__.py."""
