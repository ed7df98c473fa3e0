#!/usr/bin/env python3
"""Deterministic TranStats-schema flight fixture generator.

Writes src/test/resources/flights_transtats.csv: 110 positional columns per
row (FIXTURES.md SSA1 layout), quoted fields, including city fields with
embedded commas BEFORE column 17 so a naive split(',') would shift Dest --
the quote-aware parse is load-bearing, exactly like real TranStats files.

Hand-constructed rows pin the Flight1 two-leg golden:
  valid pairs (ORD->via->JFK, same date, arr1 < dep2):
    (L1a,L2a) 5+3, (L1a,L2b) 5+7, (L1b,L2b) 10.5+7, (L1d,L2d) 0+12
  count=4, sum=49.5, (long)49 -> average=12.25
and the Flight2 2008 goldens: AA month1 ceil(avg(0,12))=6, UA month2
ceil(avg(3,4))=4 (int-truncated 3.7/4.2), all other months 0-filled.
Filler rows are year 2006 and avoid ORD/JFK so they hit neither operator.
"""
import random

NCOLS = 110
CITY = {  # quoted, comma-bearing city names (col 14 origin / col 20 dest)
    "ORD": 'Chicago, IL', "JFK": 'New York, NY', "DEN": 'Denver, CO',
    "PHX": 'Phoenix, AZ', "ATL": 'Atlanta, GA', "LAX": 'Los Angeles, CA',
    "SFO": 'San Francisco, CA', "BOS": 'Boston, MA', "SEA": 'Seattle, WA',
    "MIA": 'Miami, FL', "DFW": 'Dallas/Fort Worth, TX',
}


def q(s):
    return '"' + str(s).replace('"', '""') + '"'


def row(year, month, day, carrier, fnum, origin, dest, dep, arr, delay,
        cancelled="0.00", diverted="0.00"):
    c = [""] * NCOLS
    c[0] = str(year)
    c[1] = str((month - 1) // 3 + 1)
    c[2] = str(month)
    c[3] = str(day)
    c[4] = str((day % 7) + 1)
    c[5] = f"{year}-{month:02d}-{day}"  # uuuu-MM-d, day w/o zero-pad
    c[6] = carrier
    c[10] = str(fnum)
    c[11] = origin
    c[14] = CITY.get(origin, "Nowhere, ZZ")   # embedded comma pre-17!
    c[17] = dest
    c[20] = CITY.get(dest, "Nowhere, ZZ")
    c[24] = str(dep)
    c[35] = str(arr)
    c[37] = "" if delay is None else f"{delay:.2f}"
    c[41] = cancelled
    c[43] = diverted
    # every field quoted, like the real TranStats export
    return ",".join(q(x) for x in c)


rows = []
# --- Flight1 two-leg golden set (window 2007-06-01..2008-05-31) ---
rows.append(row(2007, 7, 15, "AA", 100, "ORD", "DEN", 800, 1010, 5.0))    # L1a
rows.append(row(2007, 7, 15, "AA", 101, "ORD", "DEN", 950, 1200, 10.5))   # L1b
rows.append(row(2007, 7, 15, "AA", 102, "DEN", "JFK", 1100, 1420, 3.0))   # L2a
rows.append(row(2007, 7, 15, "AA", 103, "DEN", "JFK", 1300, 1640, 7.0))   # L2b
rows.append(row(2007, 7, 16, "AA", 104, "ORD", "DEN", 700, 900, 2.0))     # L1c
rows.append(row(2007, 7, 16, "AA", 105, "DEN", "JFK", 850, 1150, 4.0))    # L2c (no pair: 900>850)
rows.append(row(2008, 1, 10, "AA", 106, "ORD", "PHX", 1200, 1500, None))  # L1d "" -> 0
rows.append(row(2008, 1, 10, "AA", 107, "PHX", "JFK", 1600, 2330, 12.0))  # L2d
# excluded: cancelled leg1, orphan leg2, direct both-endpoint, out-of-window,
# diverted leg2, O'Hare "" escaped-quote row (also out-of-window by date)
rows.append(row(2007, 8, 2, "AA", 108, "ORD", "ATL", 900, 1130, 99.0,
                cancelled="1.00"))
rows.append(row(2007, 8, 2, "AA", 109, "ATL", "JFK", 1200, 1415, 1.0))
rows.append(row(2007, 9, 5, "AA", 110, "ORD", "JFK", 700, 1015, 30.0))
rows.append(row(2009, 1, 1, "AA", 111, "ORD", "DEN", 800, 1010, 5.0))
rows.append(row(2007, 10, 3, "AA", 112, "DEN", "JFK", 1100, 1420, 3.0,
                diverted="1.00"))
r = row(2007, 5, 20, "AA", 113, "ORD", "DEN", 600, 810, 2.0)
rows.append(r.replace(q(CITY["ORD"]), q('Chicago "O\'Hare", IL')))  # pre-window
# --- Flight2 2008 golden set (kept clear of ORD/JFK) ---
rows.append(row(2008, 2, 5, "UA", 200, "LAX", "SFO", 900, 1015, 3.7))
rows.append(row(2008, 2, 6, "UA", 201, "SFO", "LAX", 1100, 1215, 4.2))
rows.append(row(2008, 2, 7, "UA", 202, "LAX", "SEA", 800, 1100, 100.0,
                cancelled="1.00"))  # excluded from Flight2 (cancelled)
malformed = row(2008, 3, 1, "", 203, "BOS", "MIA", 700, 1030, 5.0)
rows.append(malformed)  # empty carrier -> malformed guard drops it
# --- filler breadth: year 2006, no ORD/JFK, varied values ---
rng = random.Random(42)
ports = ["LAX", "SFO", "BOS", "SEA", "MIA", "DFW", "ATL", "PHX", "DEN"]
carriers = ["WN", "DL", "B6", "AS", "NK"]
for i in range(300):
    o = rng.choice(ports)
    d = rng.choice([p for p in ports if p != o])
    month = rng.randint(1, 12)
    day = rng.randint(1, 28)
    dep = rng.randint(0, 23) * 100 + rng.randint(0, 59)
    arr = rng.randint(0, 23) * 100 + rng.randint(0, 59)
    delay = None if rng.random() < 0.1 else round(rng.uniform(0, 180), 2)
    cancelled = "1.00" if rng.random() < 0.05 else "0.00"
    rows.append(row(2006, month, day, rng.choice(carriers), 1000 + i,
                    o, d, dep, arr, delay, cancelled=cancelled))

out = "src/test/resources/flights_transtats.csv"
with open(out, "w") as f:
    f.write("\n".join(rows) + "\n")
print(f"wrote {out}: {len(rows)} rows x {NCOLS} cols")
