"""PII redaction stage (stages/text.PIIRedact): scalar-oracle tests.

The oracle re-runs the documented semantics one string at a time with
plain ``re`` calls (count on the original text, sequential redaction
email -> phone -> ip) — independent of the pandas vectorized kernels.
"""

import hashlib
import re

import pandas as pd

from gdal_ray.stages.text import PIIRedact

CASES = [
    "plain text without any pii at all",
    "reach me at jane.doe+spam@mail.example.org today",
    "two mails a@b.io and c_d%x@sub.domain.co end",
    "call 555-123-4567 or 800 555 1212 now",
    "host 192.168.0.1 and 10.0.255.99 up",
    "mixed bob@x.org 10.1.2.3 555-000-1111 tail",
    "not an ip 1.2.3 nor 1.2.3.4.5 is two",
    "no mail at @example.com or user@ bare",
    "",
    "unicode café über straße no pii",
]


def _oracle(text):
    email = re.compile(PIIRedact.EMAIL, re.ASCII)
    phone = re.compile(PIIRedact.PHONE, re.ASCII)
    ip = re.compile(PIIRedact.IP, re.ASCII)
    n_e = len(email.findall(text))
    n_p = len(phone.findall(text))
    n_i = len(ip.findall(text))
    red = ip.sub("<IP>", phone.sub("<PHONE>", email.sub("<EMAIL>", text)))
    return n_e, n_p, n_i, red


def test_pii_redact_matches_scalar_oracle():
    batch = pd.DataFrame({"doc_id": range(len(CASES)), "text": CASES})
    out = PIIRedact()(batch.copy())
    for i, text in enumerate(CASES):
        n_e, n_p, n_i, red = _oracle(text)
        assert out.loc[i, "n_emails"] == n_e, text
        assert out.loc[i, "n_phones"] == n_p, text
        assert out.loc[i, "n_ips"] == n_i, text
        assert out.loc[i, "redacted"] == red, text
        assert out.loc[i, "redacted_md5"] == hashlib.md5(
            red.encode("utf-8")).hexdigest()


def test_pii_redact_pinned_values():
    # hand-derived expectations pin the pattern semantics themselves
    out = PIIRedact()(pd.DataFrame({"text": CASES}))
    assert out["n_emails"].tolist() == [0, 1, 2, 0, 0, 1, 0, 0, 0, 0]
    assert out["n_phones"].tolist() == [0, 0, 0, 2, 0, 1, 0, 0, 0, 0]
    assert out["n_ips"].tolist() == [0, 0, 0, 0, 2, 1, 1, 0, 0, 0]
    assert out.loc[5, "redacted"] == "mixed <EMAIL> <IP> <PHONE> tail"
    # "." is a non-word char so \b holds between '4' and '.': the first
    # four octets of "1.2.3.4.5" DO match (standard naive-IPv4 behavior);
    # "1.2.3" stays (too short)
    assert out.loc[6, "redacted"] == "not an ip 1.2.3 nor <IP>.5 is two"


def test_pii_redact_null_text():
    out = PIIRedact()(pd.DataFrame({"text": [None, "a@b.io"]}))
    assert out["n_emails"].tolist() == [0, 1]
    assert out.loc[0, "redacted"] == ""
