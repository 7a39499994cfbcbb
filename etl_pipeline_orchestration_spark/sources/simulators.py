"""Deterministic generators for the six heterogeneous source datasets.

The reference simulates its sources as in-process pandas frames
(reference etl_pipeline.py:88-175, seeds 1-6). Here the same datasets are
generated once and written as *real files in each source's native format*
(CSV / JSON-lines / SQLite / spreadsheet-export / pipe-delimited flat
file / raw web-log text) so the Spark readers in ``readers.py`` exercise
genuine connector paths instead of in-memory shortcuts.

Schemas and generation rules mirror the reference (FIXTURES.md §A) with
a fixed base clock so runs are reproducible; row counts default to the
reference's (1000/800/600/400/300/2000).
"""

from __future__ import annotations

import json
import os
import sqlite3
from datetime import datetime, timedelta

import numpy as np
import pandas as pd

BASE_CLOCK = datetime(2026, 1, 1, 12, 0, 0)

REGIONS = ["North", "South", "East", "West"]
PRODUCTS = ["A", "B", "C", "D"]
SEGMENTS = ["Premium", "Standard", "Basic"]
WAREHOUSES = ["WH-North", "WH-South", "WH-East"]
DEPARTMENTS = ["Analytics", "Engineering", "Finance", "Sales", "Operations"]
EVENT_TYPES = ["page_view", "click", "purchase", "login", "logout", "search"]
DEVICES = ["mobile", "desktop", "tablet"]


def gen_sales(n: int = 1000, clock: datetime = BASE_CLOCK) -> pd.DataFrame:
    rng = np.random.RandomState(1)
    return pd.DataFrame(
        {
            "sale_id": [f"S{i:05d}" for i in range(n)],
            "date": [
                (clock - timedelta(days=i % 90)).strftime("%Y-%m-%d")
                for i in range(n)
            ],
            "region": rng.choice(REGIONS, n),
            "product": rng.choice(PRODUCTS, n),
            "revenue": np.round(rng.uniform(1000, 100000, n), 2),
            "units": rng.randint(1, 100, n),
            "source": "CSV_SALES",
        }
    )


def gen_customers(n: int = 800, clock: datetime = BASE_CLOCK) -> pd.DataFrame:
    rng = np.random.RandomState(2)
    return pd.DataFrame(
        {
            "customer_id": [f"C{i:05d}" for i in range(n)],
            "name": [f"Customer_{i}" for i in range(n)],
            "email": [
                f"c{i}@mail.com" if rng.rand() > 0.05 else None for i in range(n)
            ],
            "segment": rng.choice(SEGMENTS, n),
            "tenure_days": rng.randint(1, 1000, n),
            "churn_risk": np.round(rng.uniform(0, 1, n), 3),
            "source": "JSON_API",
        }
    )


def gen_finance(n: int = 600, clock: datetime = BASE_CLOCK) -> pd.DataFrame:
    rng = np.random.RandomState(3)
    return pd.DataFrame(
        {
            "txn_id": [f"TXN{i:06d}" for i in range(n)],
            "account": [f"ACC{rng.randint(1000, 9999)}" for _ in range(n)],
            "debit": np.round(rng.uniform(0, 50000, n), 2),
            "credit": np.round(rng.uniform(0, 50000, n), 2),
            "balance": np.round(rng.uniform(10000, 500000, n), 2),
            "txn_date": [
                (clock - timedelta(days=i % 60)).strftime("%Y-%m-%d")
                for i in range(n)
            ],
            "source": "SQL_FINANCE",
        }
    )


def gen_inventory(n: int = 400, clock: datetime = BASE_CLOCK) -> pd.DataFrame:
    rng = np.random.RandomState(4)
    return pd.DataFrame(
        {
            "sku": [f"SKU-{i:04d}" for i in range(n)],
            "product": [f"Product_{chr(65 + i % 26)}" for i in range(n)],
            "quantity": rng.randint(0, 5000, n),
            "warehouse": rng.choice(WAREHOUSES, n),
            "reorder_pt": rng.randint(50, 500, n),
            "unit_cost": np.round(rng.uniform(10, 1000, n), 2),
            "source": "EXCEL_INVENTORY",
        }
    )


def gen_hr(n: int = 300, clock: datetime = BASE_CLOCK) -> pd.DataFrame:
    rng = np.random.RandomState(5)
    return pd.DataFrame(
        {
            "emp_id": [f"EMP{i:04d}" for i in range(n)],
            "department": rng.choice(DEPARTMENTS, n),
            "salary": np.round(rng.uniform(25000, 200000, n), 0),
            "join_date": [
                (clock - timedelta(days=int(d))).strftime("%Y-%m-%d")
                for d in rng.randint(30, 3650, n)
            ],
            "rating": rng.choice([1, 2, 3, 4, 5], n),
            "active": rng.choice([True, False], n, p=[0.9, 0.1]),
            "source": "FLAT_FILE_HR",
        }
    )


def gen_web_logs(n: int = 2000, clock: datetime = BASE_CLOCK) -> pd.DataFrame:
    rng = np.random.RandomState(6)
    return pd.DataFrame(
        {
            "event_id": [f"EVT{i:07d}" for i in range(n)],
            "user_id": [f"U{rng.randint(1000, 9999)}" for _ in range(n)],
            "event_type": rng.choice(EVENT_TYPES, n),
            "timestamp": [
                (clock - timedelta(seconds=i * 30)).strftime("%Y-%m-%d %H:%M:%S")
                for i in range(n)
            ],
            "session_id": [f"SES{rng.randint(10000, 99999)}" for _ in range(n)],
            "device": rng.choice(DEVICES, n, p=[0.55, 0.35, 0.10]),
            "source": "WEB_LOGS",
        }
    )


def write_landing_files(landing_dir: str, clock: datetime = BASE_CLOCK) -> dict[str, str]:
    """Materialize each dataset in its native source format; returns
    {source_key: path}. These are the inputs the Spark readers consume."""
    os.makedirs(landing_dir, exist_ok=True)
    paths: dict[str, str] = {}

    sales = gen_sales(clock=clock)
    paths["sales_csv"] = os.path.join(landing_dir, "sales.csv")
    sales.to_csv(paths["sales_csv"], index=False)

    customers = gen_customers(clock=clock)
    paths["customers_json"] = os.path.join(landing_dir, "customers.jsonl")
    with open(paths["customers_json"], "w") as f:
        for rec in customers.to_dict(orient="records"):
            f.write(json.dumps(rec) + "\n")

    finance = gen_finance(clock=clock)
    paths["finance_db"] = os.path.join(landing_dir, "finance.db")
    with sqlite3.connect(paths["finance_db"]) as conn:
        finance.to_sql("transactions", conn, if_exists="replace", index=False)

    inventory = gen_inventory(clock=clock)
    # Native target is .xlsx; without an xlsx writer in the environment the
    # spreadsheet export lands as CSV (same reader bridge handles both).
    try:
        import openpyxl  # noqa: F401

        paths["inventory_excel"] = os.path.join(landing_dir, "inventory.xlsx")
        inventory.to_excel(paths["inventory_excel"], index=False)
    except ImportError:
        paths["inventory_excel"] = os.path.join(landing_dir, "inventory.csv")
        inventory.to_csv(paths["inventory_excel"], index=False)

    hr = gen_hr(clock=clock)
    paths["hr_flat"] = os.path.join(landing_dir, "hr.txt")
    hr.to_csv(paths["hr_flat"], index=False, sep="|")

    logs = gen_web_logs(clock=clock)
    paths["web_logs"] = os.path.join(landing_dir, "access.log")
    with open(paths["web_logs"], "w") as f:
        for r in logs.itertuples(index=False):
            f.write(
                f"{r.event_id} {r.user_id} [{r.timestamp}] "
                f'"{r.event_type}" {r.session_id} {r.device}\n'
            )
    return paths
