"""x509 principal identity — the reference PKI model re-expressed.

The reference derives every principal from its mTLS client certificate:
the SHA-256 fingerprint of the DER bytes IS the user's primary identity,
with subject/issuer DNs and arbitrary attributes alongside
(``core/src/pki/mod.rs:12-25``, ``core/src/model/user.rs:17-28``). Two
layers reproduce that model:

* **Transport gate** (r6): with ``mtls_ca`` set on the server, gRPC
  performs true handshake-level mutual TLS — a client whose certificate
  doesn't chain to the CA is rejected before any RPC runs
  (:func:`generate_ca` / :func:`generate_client_identity`).
* **Principal binding**: pyarrow's handlers can't see the verified peer
  certificate, so identity is bound INSIDE the Flight handshake: the
  server issues a random nonce, the client returns its DER certificate
  plus an Ed25519/RSA signature over the nonce, and the server verifies
  the signature against the certificate's own public key before
  fingerprinting it.

Composed, the trust outcome matches the reference — a transport-verified,
possession-proven identity that cannot be spoofed by naming someone
else's principal or replaying someone else's certificate.
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass, field


@dataclass(frozen=True)
class X509User:
    """``model/user.rs:17-28`` analog: fingerprint-keyed principal."""

    x509_sha256: str          # uppercase hex SHA-256 of the DER cert
    principal: str            # name used for permission resolution
    x509_subject: str = ""
    x509_issuer: str = ""
    attributes: dict = field(default_factory=dict)  # e.g. {"is_admin": True}


def fingerprint_der(der: bytes) -> str:
    """Uppercase-hex SHA-256 of DER bytes — ``pki/mod.rs:12-16`` exactly."""
    return hashlib.sha256(der).hexdigest().upper()


def normalize_x509_users(users) -> dict[str, X509User]:
    """One fingerprint → :class:`X509User` map for every transport face.

    Accepts the shapes both the Flight and REST servers take: an iterable
    of ``X509User``, or a dict keyed by fingerprint whose values are
    ``X509User`` objects (``RelayCatalog.users``) or plain principal
    strings (wrapped into attribute-less users). Shared so the two faces
    cannot drift on what a users table means."""
    if isinstance(users, dict):
        return {fp: (u if isinstance(u, X509User)
                     else X509User(fp, principal=u))
                for fp, u in users.items()}
    return {u.x509_sha256: u for u in users}


def merge_identity_tables(x509_users, x509_relays
                          ) -> tuple[dict[str, X509User], frozenset[str]]:
    """Merge user and trusted-relay tables into one fingerprint map plus
    the set of relay principals, enforcing disjointness both ways.

    ONE implementation for every transport face (Flight handshake, REST
    listener) so the security validation cannot drift between them: a
    fingerprint enrolled as both user and relay, or a principal name
    shared across the two roles, is rejected — the reference keeps users
    and relays in separate tables looked up exclusively
    (``core/src/execute/utils.rs:70-104``)."""
    users = normalize_x509_users(x509_users or {})
    relays = normalize_x509_users(x509_relays or {})
    dup = set(users) & set(relays)
    if dup:
        raise ValueError(
            f"fingerprint(s) enrolled as both user and relay: "
            f"{sorted(fp[:16] for fp in dup)}")
    relay_principals = frozenset(u.principal for u in relays.values())
    overlap = relay_principals & {u.principal for u in users.values()}
    if overlap:
        raise ValueError(
            f"principal(s) enrolled as both user and relay: "
            f"{sorted(overlap)}")
    return {**users, **relays}, relay_principals


def parse_certificate(der: bytes) -> tuple[str, str, str]:
    """``(fingerprint, subject_dn, issuer_dn)`` — ``pki/mod.rs:12-25``."""
    from cryptography import x509

    cert = x509.load_der_x509_certificate(der)
    return (fingerprint_der(der),
            cert.subject.rfc4514_string(),
            cert.issuer.rfc4514_string())


def verify_possession(der: bytes, nonce: bytes, signature: bytes) -> bool:
    """True iff ``signature`` over ``nonce`` verifies against the
    certificate's own public key (Ed25519 or RSA-PSS/SHA256)."""
    from cryptography import x509
    from cryptography.exceptions import InvalidSignature
    from cryptography.hazmat.primitives import hashes
    from cryptography.hazmat.primitives.asymmetric import ed25519, padding, rsa

    try:
        cert = x509.load_der_x509_certificate(der)
        pub = cert.public_key()
        if isinstance(pub, ed25519.Ed25519PublicKey):
            pub.verify(signature, nonce)
            return True
        if isinstance(pub, rsa.RSAPublicKey):
            pub.verify(signature, nonce,
                       padding.PSS(mgf=padding.MGF1(hashes.SHA256()),
                                   salt_length=padding.PSS.MAX_LENGTH),
                       hashes.SHA256())
            return True
        return False
    except (InvalidSignature, ValueError):
        return False


def sign_nonce(private_key, nonce: bytes) -> bytes:
    """Client side of :func:`verify_possession`."""
    from cryptography.hazmat.primitives import hashes
    from cryptography.hazmat.primitives.asymmetric import ed25519, padding

    if isinstance(private_key, ed25519.Ed25519PrivateKey):
        return private_key.sign(nonce)
    return private_key.sign(
        nonce,
        padding.PSS(mgf=padding.MGF1(hashes.SHA256()),
                    salt_length=padding.PSS.MAX_LENGTH),
        hashes.SHA256())


def pem_cert_to_der(cert_pem: bytes) -> bytes:
    """DER bytes of a PEM certificate — the fingerprint-enrollment form
    (``conf.rs:102-115`` reads the client cert PEM and fingerprints its
    DER for the relay's own identity row)."""
    from cryptography import x509
    from cryptography.hazmat.primitives.serialization import Encoding

    return x509.load_pem_x509_certificate(cert_pem).public_bytes(
        Encoding.DER)


def load_private_key(key_or_pem):
    """Accept a key OBJECT or PEM bytes, return the key object.

    Executor-side auth (the distributed Flight scan) ships the client key
    as PEM bytes inside a serialized closure — key objects don't pickle —
    and re-loads it task-side through this helper."""
    if isinstance(key_or_pem, (bytes, bytearray)):
        from cryptography.hazmat.primitives.serialization import (
            load_pem_private_key,
        )
        return load_pem_private_key(bytes(key_or_pem), password=None)
    return key_or_pem


def private_key_pem(key) -> bytes:
    """PEM-serialize a private key object (inverse of
    :func:`load_private_key`) so it can travel to executor tasks."""
    if isinstance(key, (bytes, bytearray)):
        return bytes(key)
    from cryptography.hazmat.primitives import serialization

    return key.private_bytes(
        serialization.Encoding.PEM,
        serialization.PrivateFormat.PKCS8,
        serialization.NoEncryption())


def generate_tls_identity(common_name: str = "localhost"
                          ) -> tuple[bytes, bytes]:
    """Self-signed TLS server identity as ``(cert_pem, key_pem)`` for the
    gRPC channel itself (the reference terminates mTLS on every relay —
    ``deploy/`` ships per-relay certs). RSA-2048 + SAN for localhost /
    127.0.0.1 so gRPC hostname verification passes in tests; production
    brings CA-issued certs, the server only needs the PEM pair."""
    import datetime
    import ipaddress

    from cryptography import x509
    from cryptography.hazmat.primitives import hashes, serialization
    from cryptography.hazmat.primitives.asymmetric import rsa
    from cryptography.x509.oid import NameOID

    key = rsa.generate_private_key(public_exponent=65537, key_size=2048)
    name = x509.Name([x509.NameAttribute(NameOID.COMMON_NAME, common_name)])
    now = datetime.datetime(2020, 1, 1)
    cert = (x509.CertificateBuilder()
            .subject_name(name).issuer_name(name)
            .public_key(key.public_key())
            .serial_number(x509.random_serial_number())
            .not_valid_before(now)
            .not_valid_after(now + datetime.timedelta(days=36500))
            .add_extension(x509.SubjectAlternativeName([
                x509.DNSName("localhost"),
                x509.IPAddress(ipaddress.ip_address("127.0.0.1")),
            ]), critical=False)
            .sign(key, algorithm=hashes.SHA256()))
    cert_pem = cert.public_bytes(serialization.Encoding.PEM)
    key_pem = key.private_bytes(
        serialization.Encoding.PEM,
        serialization.PrivateFormat.TraditionalOpenSSL,
        serialization.NoEncryption())
    return cert_pem, key_pem


def generate_identity(common_name: str):
    """Self-signed Ed25519 identity for tests/dev: ``(cert_der, key)``.

    Production deployments bring CA-issued certs; identity here is the
    FINGERPRINT (registered out-of-band, like the reference's ``users``
    table), so self-signed vs CA-signed only changes who can mint new
    certs, not how principals resolve.
    """
    import datetime

    from cryptography import x509
    from cryptography.hazmat.primitives.asymmetric import ed25519
    from cryptography.x509.oid import NameOID

    key = ed25519.Ed25519PrivateKey.generate()
    name = x509.Name([x509.NameAttribute(NameOID.COMMON_NAME, common_name)])
    now = datetime.datetime(2020, 1, 1)
    cert = (x509.CertificateBuilder()
            .subject_name(name).issuer_name(name)
            .public_key(key.public_key())
            .serial_number(x509.random_serial_number())
            .not_valid_before(now)
            .not_valid_after(now + datetime.timedelta(days=36500))
            .sign(key, algorithm=None))
    from cryptography.hazmat.primitives.serialization import Encoding
    return cert.public_bytes(Encoding.DER), key


def generate_ca(common_name: str = "dataweb-test-ca"):
    """Self-signed CA for transport-level client verification:
    ``(ca_cert_pem, ca_key)``. The cert PEM is what a server passes as
    ``mtls_ca`` (gRPC ``root_certificates`` + ``verify_client``); the key
    signs client identities via :func:`generate_client_identity`."""
    import datetime

    from cryptography import x509
    from cryptography.hazmat.primitives import hashes, serialization
    from cryptography.hazmat.primitives.asymmetric import rsa
    from cryptography.x509.oid import NameOID

    key = rsa.generate_private_key(public_exponent=65537, key_size=2048)
    name = x509.Name([x509.NameAttribute(NameOID.COMMON_NAME, common_name)])
    now = datetime.datetime(2020, 1, 1)
    cert = (x509.CertificateBuilder()
            .subject_name(name).issuer_name(name)
            .public_key(key.public_key())
            .serial_number(x509.random_serial_number())
            .not_valid_before(now)
            .not_valid_after(now + datetime.timedelta(days=36500))
            .add_extension(x509.BasicConstraints(ca=True, path_length=0),
                           critical=True)
            .sign(key, algorithm=hashes.SHA256()))
    return cert.public_bytes(serialization.Encoding.PEM), key


def generate_client_identity(ca_cert_pem: bytes, ca_key,
                             common_name: str,
                             dns_names: list[str] | None = None
                             ) -> tuple[bytes, bytes]:
    """CA-signed client identity ``(cert_pem, key_pem)`` for gRPC mutual
    TLS (``FlightClient`` ``cert_chain``/``private_key``). The DER form of
    the cert can ALSO enroll as the fingerprint principal, so one identity
    serves both the transport gate and the permission layer.
    ``dns_names`` adds a SubjectAlternativeName extension (plus
    ``127.0.0.1`` when it contains ``localhost``) so the same helper can
    mint CA-issued SERVER certs that pass Python ssl's SAN-only hostname
    verification (the AMQPS broker face)."""
    import datetime

    from cryptography import x509
    from cryptography.hazmat.primitives import hashes, serialization
    from cryptography.hazmat.primitives.asymmetric import rsa
    from cryptography.x509.oid import NameOID

    ca_cert = x509.load_pem_x509_certificate(ca_cert_pem)
    key = rsa.generate_private_key(public_exponent=65537, key_size=2048)
    now = datetime.datetime(2020, 1, 1)
    builder = (x509.CertificateBuilder()
               .subject_name(x509.Name([
                   x509.NameAttribute(NameOID.COMMON_NAME, common_name)]))
               .issuer_name(ca_cert.subject)
               .public_key(key.public_key())
               .serial_number(x509.random_serial_number())
               .not_valid_before(now)
               .not_valid_after(now + datetime.timedelta(days=36500)))
    if dns_names:
        import ipaddress
        sans: list = [x509.DNSName(n) for n in dns_names]
        if "localhost" in dns_names:
            sans.append(x509.IPAddress(ipaddress.ip_address("127.0.0.1")))
        builder = builder.add_extension(
            x509.SubjectAlternativeName(sans), critical=False)
    cert = builder.sign(ca_key, algorithm=hashes.SHA256())
    cert_pem = cert.public_bytes(serialization.Encoding.PEM)
    key_pem = key.private_bytes(
        serialization.Encoding.PEM,
        serialization.PrivateFormat.TraditionalOpenSSL,
        serialization.NoEncryption())
    return cert_pem, key_pem
