"""Generated large-scale differential test: a seeded 1000-row dataset
rendered into BOTH physical dialects (CSV: DD/MM/YYYY dates + unit-denominated
decimals; PRN: YYYYMMDD dates + integer cents, fixed-width with widths derived
from the data) must produce byte-identical JSON and HTML through the engine —
the reference's differencing property (README.md:35-44) far beyond the 7-row
shipped fixture."""

import io
import random

import pytest

from ts_etl_spark.cli import run_conversion
from ts_etl_spark.schema import EXPECTED_HEADERS

N_ROWS = 1000


def _dataset(seed: int = 42):
    rng = random.Random(seed)
    rows = []
    for i in range(N_ROWS):
        name = f"Person{i}, {'ÆØß'[i % 3]}{rng.randint(1, 99)}"
        address = f"Straße {rng.randint(1, 500)}"
        postcode = f"{rng.randint(1000, 9999)} {chr(65 + rng.randint(0, 25))}{chr(65 + rng.randint(0, 25))}"
        phone = rng.choice(
            [f"0{rng.randint(10, 99)} {rng.randint(1000000, 9999999)}",
             f"+{rng.randint(1, 99)} {rng.randint(100, 999)} {rng.randint(100000, 999999)}"]
        )
        cents = rng.randint(0, 10_000_000)
        day, month, year = rng.randint(1, 28), rng.randint(1, 12), rng.randint(1940, 2005)
        rows.append((name, address, postcode, phone, cents, (year, month, day)))
    return rows


def _csv_bytes(rows) -> bytes:
    out = ["Name,Address,Postcode,Phone,Credit Limit,Birthday"]
    for name, address, postcode, phone, cents, (y, m, d) in rows:
        units = cents // 100
        frac = cents % 100
        money = str(units) if frac == 0 else f"{units}.{frac:02d}".rstrip("0")
        out.append(f'"{name}",{address},{postcode},{phone},{money},{d:02d}/{m:02d}/{y}')
    return ("\n".join(out) + "\n").encode("latin1")


def _prn_bytes(rows) -> bytes:
    str_rows = [
        (name, address, postcode, phone, str(cents), f"{y}{m:02d}{d:02d}")
        for name, address, postcode, phone, cents, (y, m, d) in rows
    ]
    widths = []
    for col, header in enumerate(EXPECTED_HEADERS):
        w = max([len(header)] + [len(r[col]) for r in str_rows]) + 1
        widths.append(w)
    def fmt(cells):
        return "".join(c.ljust(w) for c, w in zip(cells, widths)).rstrip()
    lines = [fmt(EXPECTED_HEADERS)] + [fmt(r) for r in str_rows]
    return ("\n".join(lines) + "\n").encode("latin1")


@pytest.mark.parametrize("out_type", ["json", "html"])
def test_generated_differencing_property(spark, out_type):
    rows = _dataset()
    outputs = []
    for in_type, data in (("csv", _csv_bytes(rows)), ("prn", _prn_bytes(rows))):
        buf = io.StringIO()
        run_conversion(in_type, out_type, data, buf, spark=spark)
        outputs.append(buf.getvalue())
    assert outputs[0] == outputs[1]
    assert outputs[0].count("Person999") == 1  # all rows made it through
