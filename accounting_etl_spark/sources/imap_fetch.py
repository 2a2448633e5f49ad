"""IMAP statement fetcher (S6-S7; reference email_fetcher.py:1-104)
— a REAL ``imaplib`` client, stdlib only.

Mirrors the reference's contract: connect/login/select, server-side
``SINCE``+``FROM`` search with a client-side subject-keyword filter
(P9-P10), walk MIME parts for ``.pdf`` attachments (P11), land them
under ``downloads/YYYY-MM/<name>`` skipping files that already exist
(T1's at-most-once landing), and additionally write one JSON metadata
line per landed file — the exact schema
:func:`accounting_etl_spark.streaming.ingest.read_landing_stream`
consumes, so the poller feeds the streaming pipeline without glue.

Ingest is inherently driver-side (one mailbox, one connection — the
reference's shape); scale comes AFTER landing, where the binaryFile
scan fans the landed PDFs across executors. The IMAP class is
injectable (``imap_factory``) and the clock too (``now``): tests run
the genuine ``imaplib.IMAP4`` client against a scripted localhost
server, not a mock of this module.
"""

from __future__ import annotations

import email
import email.policy
import imaplib
import json
import os
from collections.abc import Callable
from datetime import datetime, timezone

DEFAULT_SUBJECT_KEYWORDS = ("statement", "credit card", "mastercard")


class ImapStatementFetcher:
    """Reference OutlookEmailFetcher parity (email_fetcher.py:11-104)."""

    def __init__(
        self,
        host: str,
        user: str,
        password: str,
        *,
        port: int | None = None,
        use_ssl: bool = True,
        imap_factory: Callable[..., imaplib.IMAP4] | None = None,
        now: Callable[[], datetime] | None = None,
    ) -> None:
        self.host = host
        self.user = user
        self.password = password
        self.port = port
        if imap_factory is None:
            imap_factory = imaplib.IMAP4_SSL if use_ssl else imaplib.IMAP4
        self._factory = imap_factory
        self._now = now or (lambda: datetime.now(timezone.utc))
        self.connection: imaplib.IMAP4 | None = None

    # -- session ------------------------------------------------------

    def connect(self) -> None:
        args = (self.host,) if self.port is None else (self.host, self.port)
        self.connection = self._factory(*args)
        self.connection.login(self.user, self.password)
        self.connection.select("INBOX")

    def disconnect(self) -> None:
        if self.connection is not None:
            try:
                self.connection.close()
            finally:
                self.connection.logout()
            self.connection = None

    # -- search (P9 recency + sender, P10 subject) --------------------

    def search_statements(
        self,
        *,
        sender_filter: str = "wellsfargo.com",
        subject_keywords: tuple[str, ...] = DEFAULT_SUBJECT_KEYWORDS,
        lookback_days: int = 30,
    ) -> list[str]:
        """Server-side SINCE+FROM search, client-side subject filter.
        Returns matching message sequence ids."""
        import calendar

        now = self._now()
        # RFC 3501 date-text is DD-Mon-YYYY with English month names;
        # build it by hand so the result is locale-independent
        epoch_day = now.toordinal() - lookback_days
        since = datetime.fromordinal(epoch_day)
        date_since = (
            f"{since.day:02d}-{calendar.month_abbr[since.month]}-"
            f"{since.year}"
        )
        criteria = f'(SINCE "{date_since}" FROM "{sender_filter}")'
        _, message_ids = self.connection.search(None, criteria)
        matching = []
        for email_id in message_ids[0].split():
            msg = self._fetch_message(email_id)
            subject = (msg["Subject"] or "").lower()
            if any(k in subject for k in subject_keywords):
                matching.append(email_id.decode())
        return matching

    def _fetch_message(self, email_id: bytes) -> email.message.Message:
        _, msg_data = self.connection.fetch(email_id, "(RFC822)")
        return email.message_from_bytes(
            msg_data[0][1], policy=email.policy.default
        )

    # -- landing (S7/K3/T1) -------------------------------------------

    def download_attachments(
        self,
        email_id: str,
        base_download_dir: str,
        *,
        metadata_dir: str | None = None,
    ) -> list[str]:
        """Land this message's .pdf attachments under the month
        partition; skip existing files; emit landing metadata JSON."""
        msg = self._fetch_message(email_id.encode())
        month = self._now().strftime("%Y-%m")
        download_dir = os.path.join(base_download_dir, month)
        os.makedirs(download_dir, exist_ok=True)
        landed: list[str] = []
        for part in msg.walk():
            if part.get_content_maintype() == "multipart":
                continue
            if part.get("Content-Disposition") is None:
                continue
            filename = part.get_filename()
            if not (filename and filename.lower().endswith(".pdf")):
                continue
            filepath = os.path.join(download_dir, filename)
            if os.path.exists(filepath):  # at-most-once landing
                continue
            payload = part.get_payload(decode=True)
            with open(filepath, "wb") as f:
                f.write(payload)
            landed.append(filepath)
            if metadata_dir is not None:
                self._write_metadata(
                    metadata_dir, msg, filename, len(payload)
                )
        return landed

    def _write_metadata(
        self,
        metadata_dir: str,
        msg: email.message.Message,
        filename: str,
        size_bytes: int,
    ) -> None:
        """One LANDING_SCHEMA json line per landed file (the streaming
        source's input contract)."""
        os.makedirs(metadata_dir, exist_ok=True)
        try:
            received = email.utils.parsedate_to_datetime(msg["Date"])
        except (TypeError, ValueError):
            received = self._now()
        rec = {
            "filename": filename,
            "subject": msg["Subject"] or "",
            "sender": msg["From"] or "",
            "received_at": received.strftime("%Y-%m-%dT%H:%M:%S"),
            "size_bytes": size_bytes,
        }
        out = os.path.join(metadata_dir, f"{filename}.json")
        with open(out, "w") as f:
            json.dump(rec, f)
            f.write("\n")

    # -- the reference main-loop step (main.py:55-69) ------------------

    def fetch_all(
        self,
        base_download_dir: str,
        *,
        metadata_dir: str | None = None,
        **search_kw,
    ) -> list[str]:
        landed: list[str] = []
        for email_id in self.search_statements(**search_kw):
            landed.extend(
                self.download_attachments(
                    email_id, base_download_dir, metadata_dir=metadata_dir
                )
            )
        return landed
