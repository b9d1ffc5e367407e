"""FIXTURES.md generators + pure-Python oracles for reference semantics.

Deterministic (seed 42). Each generator returns a list of row dicts ready
for ``spark.createDataFrame``; the oracles reimplement the reference SQL
semantics (``02_customer_sp.sql``, ``3BC_create_raw_pdf_text_view.sql``)
in plain Python for differential testing.
"""

from __future__ import annotations

import random
import re
import zlib
from decimal import Decimal

FIRST = ["Ann", "Bob", "Carla", "David", "Eve", "Frank", "Grace", "Hugo", "Ivy", "Jack"]
LAST = ["Smith", "Jones", "Higgins DDS", "O'Neil", "Garcia", "Lee", "Brown Jr", "Khan"]
STATES = ["California", "Texas", "Pennsylvania", "Ohio", "New York"]
CITIES = ["Springfield", "Fairview", "Riverton", "Lakewood", "Georgetown"]
JOBS = ["Engineer", "Teacher", "Nurse", "Analyst", "Chef"]
COMPANIES = ["Acme Corp", "Globex", "Initech", "Umbrella", "Stark Industries"]
CARDS = ["VISA 16 digit", "JCB 16 digit", "Mastercard", "Discover", "AMEX"]


def _phone(rng: random.Random) -> str:
    """Free-format phones exercising every normalization branch
    (FIXTURES.md §1): parens/dots/x-extensions/leading-1/+1 variants."""
    d = "".join(rng.choice("0123456789") for _ in range(10))
    style = rng.randrange(5)
    if style == 0:
        return f"({d[:3]}){d[3:6]}-{d[6:]}"
    if style == 1:
        return f"{d[:3]}.{d[3:6]}.{d[6:]}x{rng.randrange(100, 999)}"
    if style == 2:
        return f"+1-{d[:3]}-{d[3:6]}-{d[6:]}"
    if style == 3:
        return f"1{d}"
    return d


def gen_customers(n: int = 200, seed: int = 42) -> list[dict]:
    rng = random.Random(seed)
    rows = []
    for i in range(n):
        cid = str(rng.randrange(1, 10**10))  # unpadded; exercises LPAD re-pad
        rows.append(
            {
                "CUSTOMER_ID": cid,
                "NAME": f"{rng.choice(FIRST)} {rng.choice(LAST)}",
                "DOB": f"{rng.randrange(1940, 2006)}-{rng.randrange(1, 13):02d}-{rng.randrange(1, 29):02d}",
                "JOB_TITLE": rng.choice(JOBS),
                "COMPANY": rng.choice(COMPANIES),
                "STREET": f"{rng.randrange(1, 9999)} Main St",
                "CITY": rng.choice(CITIES),
                "STATE": rng.choice(STATES),
                "POSTCODE": f"{rng.randrange(10000, 99999)}",
                "COUNTRY": "United States",
                "HOME_PHONE": _phone(rng),
                "CELL_PHONE": _phone(rng),
                "WORK_PHONE": _phone(rng),
            }
        )
    return rows


def oracle_phone(s: str) -> str:
    """Pure-Python reimplementation of ``02_customer_sp.sql:24-26``."""
    d = re.sub(r"[^0-9_]", "", s)
    return d[1:11] if d.startswith("1") else d[0:10]


def oracle_standardize(row: dict) -> dict:
    """Pure-Python ``02_customer_sp.sql:24-31`` (first-space name split)."""
    name = row["NAME"]
    idx = name.find(" ")
    return {
        "CUSTOMER_ID": row["CUSTOMER_ID"],
        "FIRST_NAME": name[:idx],
        "LAST_NAME": name[idx + 1 :],
        "DOB": row["DOB"],
        "JOB_TITLE": row["JOB_TITLE"],
        "COMPANY": row["COMPANY"],
        "STREET": row["STREET"],
        "CITY": row["CITY"],
        "STATE": row["STATE"],
        "ZIP": row["POSTCODE"],
        "COUNTRY": row["COUNTRY"],
        "HOME_PHONE": oracle_phone(row["HOME_PHONE"]),
        "CELL_PHONE": oracle_phone(row["CELL_PHONE"]),
        "WORK_PHONE": oracle_phone(row["WORK_PHONE"]),
    }


def _money(rng: random.Random, lo: float = 1.0, hi: float = 9999.99) -> str:
    v = round(rng.uniform(lo, hi), 2)
    return f"${v:,.2f}"


def gen_invoice_texts(
    customers: list[dict], n: int = 120, seed: int = 43
) -> list[dict]:
    """FIXTURES.md §4 invoice text template (decoded-PDF layout of
    ``data/invoice/*.pdf``; all field offsets used by ``3BC:3-11``)."""
    rng = random.Random(seed)
    rows = []
    for i in range(n):
        cust = rng.choice(customers)
        inv = f"INV-{''.join(rng.choice('0123456789ABCDEFGHIJKLMNOPQRSTUVWXYZ') for _ in range(5))}-{rng.randrange(10, 99)}"
        txn = f"W{rng.randrange(10**10, 10**11)}"
        status = "Overdue" if rng.random() < 0.25 else "Paid"
        items = [_money(rng) for _ in range(3)]
        total = f"{round(rng.uniform(100, 200000), 2)}"
        text = (
            f"Customer: {cust['CUSTOMER_ID']} Name: {cust['NAME']} "
            f"Address: {cust['STREET']} {cust['CITY']}, {cust['STATE']} {cust['POSTCODE']} "
            f"Home Phone: {cust['HOME_PHONE']} Invoice #: {inv} Transaction ID: {txn} "
            f"Generated On: 2023-0{rng.randrange(1, 10)}-{rng.randrange(10, 29)}T{rng.randrange(10, 24) % 24:02d}:39:11Z "
            f"Invoice Status: {status} Payment Date: 2023-06-{rng.randrange(10, 29)} "
            f"Item 1 {items[0]} Item 2 {items[1]} Item 3 {items[2]} Total {total}"
        )
        rows.append({"RELATIVE_PATH": f"INVOICE_NO_{inv}_{i}.pdf", "PDF_TEXT": text})
    return rows


def oracle_parse_invoice(row: dict) -> dict:
    """Pure-Python ``3BC_create_raw_pdf_text_view.sql:3-11``."""

    def split_part(s: str, delim: str, n: int) -> str:
        parts = s.split(delim)
        return parts[n - 1] if 0 < n <= len(parts) else ""

    def between(text: str, label: str, field: int = 2) -> str:
        return split_part(split_part(text, label, 2), " ", field)

    def money(s: str) -> Decimal:
        return Decimal(s.replace("$", "").replace(",", "")).quantize(Decimal("0.01"))

    t = row["PDF_TEXT"]
    return {
        "RELATIVE_PATH": row["RELATIVE_PATH"],
        "CUSTOMER_ID": between(t, "Customer:").rjust(10, "0")[:10],
        "INVOICE_NUM": between(t, "Invoice #:"),
        "INV_GEN_DT": between(t, "Generated On:"),
        "INV_STATUS": split_part(split_part(t, "Status:", 2), "Payment", 1).strip(),
        "PAYMENT_DT": between(t, "Payment Date:"),
        "ITEM_1": money(between(t, "Item 1")),
        "ITEM_2": money(between(t, "Item 2")),
        "ITEM_3": money(between(t, "Item 3")),
        "TOTAL": Decimal(between(t, "Total")).quantize(Decimal("0.01")),
    }


PRODUCT_CATS = {f"cat{i}": [f"cat{i}-sub{j}" for j in range(3)] for i in range(10)}


def gen_product_feed(n_events: int = 800, n_products: int = 300, seed: int = 44) -> list[dict]:
    """FIXTURES.md §5: event-grained marketplace feed with DUPLICATE rows per
    PRODUCT carrying different TITLE/BRAND (makes the row_number dedup
    load-bearing)."""
    rng = random.Random(seed)
    products = [
        f"{rng.choice('ABCDEFGHIJKLMNOPQRSTUVWXYZb')}{rng.randrange(10)}-{rng.randrange(10**6, 10**7)}{rng.choice('ABCDEFG')}"
        for _ in range(n_products)
    ]
    rows = []
    for _ in range(n_events):
        p = rng.choice(products)
        rows.append(
            {
                "PRODUCT": p,
                "TITLE": rng.choice([f"{p} deluxe", f"{p} classic", "N/A"]),
                "BRAND": rng.choice(["Brandx", "Brandy", "Brandz"]),
                "MAIN_CATEGORY": rng.choice(list(PRODUCT_CATS)),
                "SUB_CATEGORY": rng.choice(PRODUCT_CATS[rng.choice(list(PRODUCT_CATS))]),
            }
        )
    return rows


def gen_txn_history(
    customers: list[dict], products: list[str], n: int = 2000, seed: int = 45
) -> list[dict]:
    """FIXTURES.md §2 txn history rows (typed; the JSON-load path is
    exercised separately)."""
    rng = random.Random(seed)
    rows = []
    for i in range(n):
        cust = rng.choice(customers)
        rows.append(
            {
                "TXN_ID": f"W{rng.randrange(10**10, 10**11)}",
                "TXN_DATE": f"2023-{rng.randrange(1, 13):02d}-{rng.randrange(1, 29):02d} "
                f"{rng.randrange(0, 24):02d}:{rng.randrange(0, 60):02d}:05.000",
                "TXN_QUANTITY": rng.randrange(1, 31),
                "CUSTOMER_ID": cust["CUSTOMER_ID"] if rng.random() > 0.01 else "9999999998",
                "PRODUCT_ID": rng.choice(products),
                "PRODUCT_DESC": "A fine product indeed",
                "PRODUCT_UNIT_PRICE": round(rng.uniform(1, 90000), 2),
                "PAYMENT_METHOD": rng.choice(CARDS),
            }
        )
    return rows


STREAM_CARDS = ["VISA", "MASTERCARD", "AMEX", "DISCOVER", "GIFT_CARD"]


def gen_txn_stream_messages(
    customers: list[dict], products: list[str], n: int = 500, seed: int = 46
) -> list[str]:
    """FIXTURES.md §3: Kafka-shaped JSON messages (lower-case keys,
    ``MM/dd/yyyy hh:mm:ss.SSSSSS a`` 12-hour timestamp format with
    microseconds — the datagen quirk)."""
    import json

    rng = random.Random(seed)
    msgs = []
    for i in range(n):
        hour24 = rng.randrange(0, 24)
        ampm = "AM" if hour24 < 12 else "PM"
        hour12 = hour24 % 12 or 12
        msgs.append(
            json.dumps(
                {
                    "txn_id": f"W{rng.randrange(10**10, 10**11)}",
                    "txn_date": f"{rng.randrange(1, 13):02d}/{rng.randrange(1, 29):02d}/2023 "
                    f"{hour12:02d}:{rng.randrange(0, 60):02d}:{rng.randrange(0, 60):02d}."
                    f"{rng.randrange(0, 10**6):06d} {ampm}",
                    "txn_quantity": rng.randrange(1, 31),
                    "customer_id": rng.choice(customers)["CUSTOMER_ID"],
                    "product_id": rng.choice(products),
                    "product_unit_price": round(rng.uniform(1, 900), 2),
                    "product_desc": "Widget",
                    "payment_method": rng.choice(STREAM_CARDS),
                }
            )
        )
    return msgs


# --- minimal PDF generation (for the binaryFile -> pandas UDF path) -------


def _pdf_escape(s: str) -> str:
    return s.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")


def make_pdf(text: str, compress: bool = False) -> bytes:
    """A minimal single-page PDF whose content stream carries ``text`` in
    one Tj operator — enough for both pypdf and the stdlib fallback."""
    content = f"BT /F1 12 Tf 72 720 Td ({_pdf_escape(text)}) Tj ET".encode("latin-1")
    filt = b""
    if compress:
        content = zlib.compress(content)
        filt = b"/Filter /FlateDecode "
    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] /Contents 4 0 R "
        b"/Resources << /Font << /F1 5 0 R >> >> >>",
        b"<< " + filt + f"/Length {len(content)} >>".encode() + b"\nstream\n" + content + b"\nendstream",
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
    ]
    out = [b"%PDF-1.4"]
    offsets = []
    pos = len(out[0]) + 1
    for i, body in enumerate(objs, start=1):
        obj = f"{i} 0 obj\n".encode() + body + b"\nendobj"
        offsets.append(pos)
        out.append(obj)
        pos += len(obj) + 1
    xref_pos = pos
    xref = [b"xref", f"0 {len(objs) + 1}".encode(), b"0000000000 65535 f "]
    xref += [f"{o:010d} 00000 n ".encode() for o in offsets]
    out.append(b"\n".join(xref))
    out.append(
        b"trailer\n<< /Size "
        + str(len(objs) + 1).encode()
        + b" /Root 1 0 R >>\nstartxref\n"
        + str(xref_pos).encode()
        + b"\n%%EOF"
    )
    return b"\n".join(out)


# --------------------------------------------------------------------------
# Minimal valid image containers (stdlib-built) for the multimodal header
# probe: real magic bytes + real dimension fields, tiny payloads.
# --------------------------------------------------------------------------


def make_png(width: int, height: int, color_type: int = 2) -> bytes:
    """A minimal spec-valid PNG: signature, IHDR, one IDAT of zlib-packed
    zero scanlines, IEND. color_type 2 = RGB (3 channels)."""
    import struct
    import zlib

    def chunk(tag: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + tag
            + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[color_type]
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    raw = (b"\x00" + b"\x00" * (width * channels)) * height  # filter-0 rows
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def make_jpeg(width: int, height: int, channels: int = 3) -> bytes:
    """A structurally valid JPEG prefix: SOI, APP0/JFIF, then a SOF0 frame
    header carrying the dimensions (what a header probe reads), truncated
    before entropy data — enough for any marker-walking parser."""
    import struct

    app0 = b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    sof0_body = struct.pack(">BHHB", 8, height, width, channels) + bytes(
        b for c in range(channels) for b in (c + 1, 0x11, 0)
    )
    return (
        b"\xff\xd8"
        + b"\xff\xe0" + struct.pack(">H", 2 + len(app0)) + app0
        + b"\xff\xc0" + struct.pack(">H", 2 + len(sof0_body)) + sof0_body
    )


def make_gif(width: int, height: int) -> bytes:
    """GIF89a logical screen descriptor + trailer."""
    import struct

    return b"GIF89a" + struct.pack("<HH", width, height) + b"\x00\x00\x00;"
