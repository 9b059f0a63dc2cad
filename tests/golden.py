"""Golden normalized rows for the Workbook2 fixture pair (FIXTURES.md §4).

Identical for both the CSV and PRN dialects — this is the reference's
differencing property (reference README.md:35-44).
"""

GOLDEN_ROWS = [
    ("Johnson, John", "Voorstraat 32", "3122GG", "0203849381", "10000.00", "1987-01-01"),
    ("Anderson, Paul", "Dorpsplein 3A", "4532AA", "0303458986", "109093.00", "1965-12-03"),
    ("Wicket, Steve", "Mendelssohnstraat 54d", "3423BA", "0313398475", "934.00", "1964-06-03"),
    ("Benetar, Pat", "Driehoog 3zwart", "2340CC", "0628938945", "54.00", "1964-09-04"),
    ("Gibson, Mal", "Vredenburg 21", "3209DD", "0648958986", "54.50", "1978-11-09"),
    ("Friendly, User", "Sint Jansstraat 32", "4220EE", "0885291029", "63.60", "1980-08-10"),
    ("Smith, John", "Børkestraße 32", "87823", "+44728889838", "9898.30", "1999-09-20"),
]

FIXTURES_DIR = __file__.rsplit("/", 1)[0] + "/fixtures"
CSV_FIXTURE = f"{FIXTURES_DIR}/Workbook2.csv"
PRN_FIXTURE = f"{FIXTURES_DIR}/Workbook2.prn"
