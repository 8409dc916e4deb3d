"""Seeded, deterministic raw hospital data generator.

Clean-room re-creation of the *data model* described in FIXTURES.md
(populations, FK structure, dirty-value and duplicate-row rates of
``generate_hospital_data.py``) without Faker and fully reproducible:
one ``random.Random(seed)`` drives everything.

Writes the same six files the reference commits: three header CSVs and
three NDJSON files.  Also produces an optional *delta batch* per
entity (changed attributes / new keys / null transitions) so the SCD2
state machine can be exercised end-to-end (FIXTURES.md section 7).
"""

from __future__ import annotations

import csv
import json
import os
import random
import uuid
from dataclasses import dataclass

FIRST = ["Ada", "Bo", "Cy", "Dee", "Ed", "Fay", "Gil", "Hana", "Ivo", "Jun"]
LAST = ["Stone", "Reed", "Vale", "Finch", "Moss", "Hale", "Crane", "Wolfe"]
CITIES = ["Austin", "Boston", "Carmel", "Denver", "Eugene", "Fargo"]
SPECIALITIES = ["Cardiology", "Orthopedics", "Neurology", "Oncology", "General Medicine"]
REASONS = ["Fever", "Injury", "Fracture", "Cancer", "Asthma"]
PROCEDURES = ["X-Ray", "MRI", "CT Scan", "Blood Test", "Surgery"]
SERVICES = ["Consultation", "Surgery", "Medication", "ICU"]
GENDERS = ["M", "F", "O"]


@dataclass
class GenConfig:
    seed: int = 42
    n_patients: int = 1000
    n_doctors: int = 200
    n_admissions: int = 2000
    n_vitals: int = 2000
    n_procedures: int = 2000
    n_billing: int = 2000
    err_rate: float = 0.2
    none_rate: float = 0.2
    dup_small: float = 0.05
    dup_large: float = 0.10
    year: int = 2025


class HospitalDataGen:
    def __init__(self, cfg: GenConfig | None = None):
        self.cfg = cfg or GenConfig()
        self.rng = random.Random(self.cfg.seed)

    # -- primitives ---------------------------------------------------
    def _uuid(self) -> str:
        return str(uuid.UUID(int=self.rng.getrandbits(128), version=4))

    def _dirty(self, value, marker: str):
        r = self.rng.random()
        if r < self.cfg.err_rate:
            return marker
        if r < self.cfg.err_rate + self.cfg.none_rate:
            return None
        return value

    def _date(self) -> str:
        return (
            f"{self.cfg.year}-{self.rng.randint(1, 12):02d}-"
            f"{self.rng.randint(1, 28):02d}"
        )

    def _datetime(self) -> str:
        return (
            f"{self._date()}T{self.rng.randint(0, 23):02d}:"
            f"{self.rng.randint(0, 59):02d}:{self.rng.randint(0, 59):02d}"
        )

    def _phone(self) -> str:
        styles = [
            lambda: f"({self.rng.randint(200, 999)}) {self.rng.randint(200, 999)}-{self.rng.randint(1000, 9999)}",
            lambda: f"+1-{self.rng.randint(200, 999)}-{self.rng.randint(200, 999)}-{self.rng.randint(1000, 9999)}",
            lambda: f"{self.rng.randint(200, 999)}.{self.rng.randint(200, 999)}.{self.rng.randint(1000, 9999)}x{self.rng.randint(1, 99)}",
        ]
        return self.rng.choice(styles)()

    # -- entities -----------------------------------------------------
    def patients(self) -> list[dict]:
        rows = []
        for _ in range(self.cfg.n_patients):
            fn = self.rng.choice(FIRST)
            ln = self.rng.choice(LAST)
            rows.append(
                {
                    "patient_id": self._uuid(),
                    "first_name": fn,
                    "last_name": ln,
                    "gender": self.rng.choice(GENDERS + [None]),
                    "age": self._dirty(self.rng.randint(1, 100), "ERR"),
                    "email": None
                    if self.rng.random() < 0.1
                    else f"{fn.lower()}.{ln.lower()}@example.com",
                    "phone": self._dirty(self._phone(), "ERR"),
                    "city": self.rng.choice(CITIES),
                }
            )
        return rows

    def doctors(self) -> list[dict]:
        return [
            {
                "doctor_id": self._uuid(),
                "first_name": self.rng.choice(FIRST),
                "last_name": self.rng.choice(LAST),
                "speciality": self.rng.choice(SPECIALITIES),
                "experience_years": self._dirty(self.rng.randint(1, 40), "EXP_ERR"),
            }
            for _ in range(self.cfg.n_doctors)
        ]

    def admissions(self, patient_ids: list[str], doctor_ids: list[str]) -> list[dict]:
        return [
            {
                "admission_id": self._uuid(),
                "patient_id": self.rng.choice(patient_ids),
                "admission_date": self._dirty(self._date(), "ERR"),
                # independent of admission_date -> often earlier, which
                # exercises the date-order sanity rule
                "discharge_date": self._dirty(self._date(), "ERR"),
                "reason": self.rng.choice(REASONS),
                "room_no": self._dirty(self.rng.randint(100, 500), "ERR"),
                "doctor_id": self.rng.choice(doctor_ids),
            }
            for _ in range(self.cfg.n_admissions)
        ]

    def vitals(self, patient_ids: list[str]) -> list[dict]:
        return [
            {
                "vital_id": self._uuid(),
                "patient_id": self.rng.choice(patient_ids),
                "temperature": self._dirty(
                    round(self.rng.uniform(96.0, 104.0), 1), "TEMP_ERR"
                ),
                "heart_rate": self._dirty(self.rng.randint(50, 150), "ERR"),
                "timestamp": self._dirty(self._datetime(), "ERR"),
            }
            for _ in range(self.cfg.n_vitals)
        ]

    def procedures(self, patient_ids: list[str]) -> list[dict]:
        return [
            {
                "procedure_id": self._uuid(),
                "patient_id": self.rng.choice(patient_ids),
                "procedure_name": self.rng.choice(PROCEDURES),
                "cost": self._dirty(round(self.rng.uniform(50, 5000), 2), "COST_ERR"),
                "performed_at": self._dirty(self._datetime(), "ERR"),
            }
            for _ in range(self.cfg.n_procedures)
        ]

    def billing(self, patient_ids: list[str]) -> list[dict]:
        rows = []
        for _ in range(self.cfg.n_billing):
            items = [
                {
                    "service": self.rng.choice(SERVICES),
                    "amount": self._dirty(
                        round(self.rng.uniform(20, 7000), 2), "BAD_AMOUNT"
                    ),
                }
                for _ in range(self.rng.randint(1, 4))
            ]
            rows.append(
                {
                    "billing_id": self._uuid(),
                    "patient_id": self.rng.choice(patient_ids),
                    "line_items": items,
                    "total": self._dirty(round(self.rng.uniform(100, 20000), 2), "ERR"),
                    "billing_date": self._dirty(self._date(), "ERR"),
                }
            )
        return rows

    # -- writers ------------------------------------------------------
    def _with_dups(self, rows: list[dict], rate: float) -> list[dict]:
        out = []
        for r in rows:
            out.append(r)
            if self.rng.random() < rate:
                out.append(dict(r))
        return out

    def write_all(self, out_dir: str) -> dict[str, list[dict]]:
        os.makedirs(out_dir, exist_ok=True)
        pats = self.patients()
        docs = self.doctors()
        pat_ids = [p["patient_id"] for p in pats]
        doc_ids = [d["doctor_id"] for d in docs]
        data = {
            "patients": self._with_dups(pats, self.cfg.dup_small),
            "doctors": self._with_dups(docs, self.cfg.dup_small),
            "admissions": self._with_dups(
                self.admissions(pat_ids, doc_ids), self.cfg.dup_large
            ),
            "vitals": self._with_dups(self.vitals(pat_ids), self.cfg.dup_large),
            "procedures": self._with_dups(self.procedures(pat_ids), self.cfg.dup_large),
            "billing": self._with_dups(self.billing(pat_ids), self.cfg.dup_large),
        }
        for name in ("patients", "doctors", "admissions"):
            self._write_csv(os.path.join(out_dir, f"{name}_raw.csv"), data[name])
        for name in ("vitals", "procedures", "billing"):
            self._write_ndjson(os.path.join(out_dir, f"{name}_raw.json"), data[name])
        return data

    @staticmethod
    def _write_csv(path: str, rows: list[dict]) -> None:
        with open(path, "w", newline="") as f:
            w = csv.DictWriter(f, fieldnames=list(rows[0].keys()))
            w.writeheader()
            for r in rows:
                w.writerow({k: ("" if v is None else v) for k, v in r.items()})

    @staticmethod
    def _write_ndjson(path: str, rows: list[dict]) -> None:
        with open(path, "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")


def generate(out_dir: str, **kwargs) -> dict[str, list[dict]]:
    return HospitalDataGen(GenConfig(**kwargs)).write_all(out_dir)
