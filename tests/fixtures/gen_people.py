"""Deterministic generator for the people.csv profile fixture (FIXTURES.md §A).

Mirrors the reference README's example dataset shape
(/root/reference/README.md:105-177): mixed numeric/categorical/date/text
columns, messy column names, string-encoded dates in mixed formats, nulls.
Run once; the generated CSV is committed.
"""

from __future__ import annotations

import csv
import random
from pathlib import Path

OUT = Path(__file__).parent / "people.csv"
N = 200


def main() -> None:
    rng = random.Random(42)
    header = [
        "age",
        "score",
        " income as at joining scheme ",
        "sex",
        "gender",
        "country",
        "education",
        "province",
        "marital_status",
        "registration_date",
        "last_login",
        "comments",
    ]
    educations = ["primary", "secondary", "bachelor", "master", "phd"]
    provinces = ["north", "south", "east", "west"]
    rows = []
    for i in range(N):
        age = "" if rng.random() < 0.05 else rng.choice([25, 25, 34, 34, 34] + list(range(18, 66)))
        income = rng.choice(["1,200", " 950 ", "2000", "1500.50", ""])
        score = round(
            (age if age != "" else 40) * 1.5 + rng.uniform(-10, 10), 2
        )
        sex = rng.choices(["M", "F"], weights=[60, 40])[0]
        country = rng.choices(["GH", "NG"], weights=[99, 1])[0]
        marital = rng.choices(["married", "single"], weights=[95, 5])[0]
        reg = (
            ""
            if rng.random() < 0.1
            else f"202{rng.randint(2, 4)}-{rng.randint(1, 12):02d}-{rng.randint(1, 28):02d}"
        )
        login_iso = f"2024-{rng.randint(1, 12):02d}-{rng.randint(1, 28):02d} {rng.randint(0, 23):02d}:{rng.randint(0, 59):02d}:00"
        login_us = f"{rng.randint(1, 12)}/{rng.randint(1, 28)}/2024 {rng.randint(0, 23):02d}:{rng.randint(0, 59):02d}"
        last_login = login_iso if i % 2 == 0 else login_us
        comments = rng.choice(
            ["", f"note {i} free text", f"call back {i}", f"vip customer {i}"]
        )
        rows.append(
            [
                age,
                score,
                income,
                sex,
                sex,  # gender duplicates sex
                country,
                rng.choice(educations),
                rng.choice(provinces),
                marital,
                reg,
                last_login,
                comments,
            ]
        )
    with OUT.open("w", newline="") as fh:
        w = csv.writer(fh)
        w.writerow(header)
        w.writerows(rows)
    print(f"wrote {OUT} ({N} rows)")


if __name__ == "__main__":
    main()
