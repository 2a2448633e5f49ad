"""IMAP statement fetch (S6-S7) with the REAL stdlib imaplib client
against a scripted localhost IMAP4 server — greeting, LOGIN, SELECT,
SEARCH, FETCH with RFC 3501 literals, LOGOUT all go over a socket.
Then the full mailbox→landing→statement-pipeline loop on the landed
real PDF bytes."""

from __future__ import annotations

import email.utils
import os
import socket
import threading
from email.message import EmailMessage

import pytest


class ScriptedImapServer:
    """Just enough IMAP4 (RFC 3501) to drive imaplib.IMAP4."""

    def __init__(self, messages: list[bytes]):
        self.messages = messages
        self.sock = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        self.sock.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self.sock.bind(("127.0.0.1", 0))
        self.sock.listen(5)
        self.port = self.sock.getsockname()[1]
        self.searches: list[str] = []
        self._thread = threading.Thread(target=self._serve, daemon=True)

    def start(self):
        self._thread.start()
        return self

    def _serve(self):
        while True:
            try:
                conn, _ = self.sock.accept()
            except OSError:
                return
            threading.Thread(
                target=self._handle, args=(conn,), daemon=True
            ).start()

    def _handle(self, conn: socket.socket):
        f = conn.makefile("rwb")

        def send(line: bytes):
            f.write(line + b"\r\n")
            f.flush()

        send(b"* OK scripted server ready")
        while True:
            raw = f.readline()
            if not raw:
                break
            line = raw.rstrip(b"\r\n").decode("latin-1")
            tag, _, rest = line.partition(" ")
            cmd, _, args = rest.partition(" ")
            cmd = cmd.upper()
            if cmd == "CAPABILITY":
                send(b"* CAPABILITY IMAP4 IMAP4rev1")
                send(f"{tag} OK CAPABILITY completed".encode())
            elif cmd == "LOGIN":
                send(f"{tag} OK LOGIN completed".encode())
            elif cmd == "SELECT":
                send(b"* %d EXISTS" % len(self.messages))
                send(b"* OK [UIDVALIDITY 1] UIDs valid")
                send(f"{tag} OK [READ-WRITE] SELECT completed".encode())
            elif cmd == "SEARCH":
                self.searches.append(args)
                ids = " ".join(
                    str(i + 1) for i in range(len(self.messages))
                )
                send(f"* SEARCH {ids}".encode())
                send(f"{tag} OK SEARCH completed".encode())
            elif cmd == "FETCH":
                n = int(args.split()[0])
                body = self.messages[n - 1]
                f.write(
                    b"* %d FETCH (RFC822 {%d}\r\n" % (n, len(body))
                )
                f.write(body)
                f.write(b")\r\n")
                f.flush()
                send(f"{tag} OK FETCH completed".encode())
            elif cmd == "CLOSE":
                send(f"{tag} OK CLOSE completed".encode())
            elif cmd == "LOGOUT":
                send(b"* BYE logging out")
                send(f"{tag} OK LOGOUT completed".encode())
                break
            else:
                send(f"{tag} NO unhandled command".encode())
        try:
            f.close()
            conn.close()
        except OSError:
            pass

    def stop(self):
        self.sock.close()


def _statement_message(subject: str, attachments: list[tuple]) -> bytes:
    msg = EmailMessage()
    msg["From"] = "Statements <alerts@wellsfargo.com>"
    msg["To"] = "user@example.org"
    msg["Subject"] = subject
    msg["Date"] = email.utils.formatdate(usegmt=True)
    msg.set_content("Your statement is attached.")
    for filename, payload, maintype, subtype in attachments:
        msg.add_attachment(
            payload, maintype=maintype, subtype=subtype,
            filename=filename,
        )
    return msg.as_bytes()


@pytest.fixture()
def pdf_bytes():
    from accounting_etl_spark.plans import fixtures as FX
    from accounting_etl_spark.sources.pdf_codec import write_pdf

    pages = FX.statement_pdf_pages()
    return {
        name: write_pdf(p) for name, p in pages.items()
    }


def test_fetch_lands_pdfs_and_metadata(tmp_path, pdf_bytes):
    from accounting_etl_spark.sources.imap_fetch import ImapStatementFetcher

    server = ScriptedImapServer([
        _statement_message(
            "Your Credit Card Statement",
            [("stmt_a.pdf", pdf_bytes["stmt_a.pdf"], "application", "pdf")],
        ),
        _statement_message(
            "Limited time offer!!",  # P10: subject filter drops it
            [("promo.pdf", b"%PDF-1.4 promo", "application", "pdf")],
        ),
        _statement_message(
            "Mastercard statement ready",  # P11: no .pdf attachment
            [("notes.txt", b"hello", "text", "plain")],
        ),
    ]).start()
    try:
        fetcher = ImapStatementFetcher(
            "127.0.0.1", "user@example.org", "secret",
            port=server.port, use_ssl=False,
        )
        fetcher.connect()
        landed = fetcher.fetch_all(
            str(tmp_path / "downloads"),
            metadata_dir=str(tmp_path / "landing_meta"),
        )
        assert len(landed) == 1
        assert os.path.basename(landed[0]) == "stmt_a.pdf"
        # month partition layout (K3) and byte-identical landing
        month_dir = os.path.basename(os.path.dirname(landed[0]))
        assert len(month_dir) == 7 and month_dir[4] == "-"
        with open(landed[0], "rb") as fh:
            assert fh.read() == pdf_bytes["stmt_a.pdf"]
        # metadata JSON matches the streaming source's schema
        metas = os.listdir(tmp_path / "landing_meta")
        assert metas == ["stmt_a.pdf.json"]
        # the SINCE+FROM criteria went to the server (P9, server-side)
        assert 'FROM "wellsfargo.com"' in server.searches[0]
        assert 'SINCE "' in server.searches[0]
        # at-most-once: a second poll lands nothing new
        again = fetcher.fetch_all(
            str(tmp_path / "downloads"),
            metadata_dir=str(tmp_path / "landing_meta"),
        )
        assert again == []
        fetcher.disconnect()
    finally:
        server.stop()


def test_mailbox_to_transactions_end_to_end(spark, tmp_path, pdf_bytes):
    """The whole reference loop (main.py:55-91): IMAP fetch → month-
    partitioned landing → binary scan → words → transactions."""
    from accounting_etl_spark.plans import fixtures as FX
    from accounting_etl_spark.plans.statement import extract_transactions
    from accounting_etl_spark.sources.binary_files import (
        scan_binary_files,
        words_from_pdfs,
    )
    from accounting_etl_spark.sources.imap_fetch import ImapStatementFetcher

    msgs = [
        _statement_message(
            "Your Credit Card Statement",
            [(name, payload, "application", "pdf")],
        )
        for name, payload in sorted(pdf_bytes.items())
    ]
    server = ScriptedImapServer(msgs).start()
    try:
        fetcher = ImapStatementFetcher(
            "127.0.0.1", "u", "p", port=server.port, use_ssl=False
        )
        fetcher.connect()
        landed = fetcher.fetch_all(str(tmp_path / "downloads"))
        fetcher.disconnect()
        assert len(landed) == 2
    finally:
        server.stop()

    words = words_from_pdfs(
        scan_binary_files(spark, str(tmp_path / "downloads"))
    )
    got = {
        (r.src_path.rsplit("/", 1)[-1], r.stmt_date_str, r.description):
            r.amount
        for r in extract_transactions(words).collect()
    }
    assert got == FX.STATEMENT_PDF_EXPECTED
