"""Registry RBAC: the reference's user-role model over the same sqlite db.

Mirrors (all paths relative to /root/reference/):
- permission model `registry/registry-provider/src/rbac_provider.rs:41-57`
  (Read/Write/Admin with role names consumer/producer/admin) and the
  access vectors `registry/registry-api/src/api_models/rbac.rs:42-45`
  (consumer=[read], producer=[read,write], admin=[read,write,manage]) —
  the vectors are cumulative, so permissions here IMPLY downward
  (admin ⇒ write ⇒ read); the reference's in-memory `RbacMap` checks
  exact (permission, resource) membership (`sql-provider/src/
  rbac_map.rs:62-72`) but its middleware always asks for the weakest
  sufficient permission, so the observable behavior matches.
- storage `registry/scripts/sqlite.sql` ``userroles`` table (soft delete:
  revocation fills delete_by/delete_reason/delete_time, never removes the
  audit row).
- resource scoping `rbac_provider.rs:59-74`: a grant's scope is a project
  name or the special ``global`` scope; global grants apply everywhere.

No Credential::App (UUID service principals) — an in-process engine has
no auth provider to mint them; credentials are plain user names
(`Credential::User`, `rbac_provider.rs:13-17`).
"""

from __future__ import annotations

import sqlite3
from datetime import datetime, timezone
from enum import IntEnum
from typing import List, Optional

from .catalog import RegistryError

GLOBAL_SCOPE = "global"


class Permission(IntEnum):
    """Ordered so that comparison implements the cumulative access
    vectors: ADMIN ≥ WRITE ≥ READ."""
    READ = 1
    WRITE = 2
    ADMIN = 3

    @property
    def role_name(self) -> str:
        return {Permission.READ: "consumer", Permission.WRITE: "producer",
                Permission.ADMIN: "admin"}[self]

    @property
    def access(self) -> List[str]:
        return {Permission.READ: ["read"],
                Permission.WRITE: ["read", "write"],
                Permission.ADMIN: ["read", "write", "manage"]}[self]

    @classmethod
    def from_role(cls, role: str) -> "Permission":
        try:
            return {"consumer": cls.READ, "producer": cls.WRITE,
                    "admin": cls.ADMIN}[role.lower()]
        except KeyError:
            raise RegistryError(f"invalid role {role!r}") from None


class PermissionDenied(RegistryError):
    """`RbacError::PermissionDenied` (rbac_provider.rs:98-100)."""


import contextvars

# Raft-replicated applies must be deterministic across replicas: the
# leader stamps the command's wall-clock time at PROPOSE, and the state
# machine pins it here for the duration of the apply so every replica
# writes the identical audit timestamp (registry/raft_http.py).
_NOW_OVERRIDE: contextvars.ContextVar = contextvars.ContextVar(
    "rbac_now_override", default=None)


def _now() -> str:
    pinned = _NOW_OVERRIDE.get()
    if pinned is not None:
        return pinned
    return datetime.now(timezone.utc).strftime("%Y-%m-%d %H:%M:%S")


class RbacStore:
    """User-role grants in the registry's sqlite db (``userroles``)."""

    def __init__(self, db: sqlite3.Connection):
        self.db = db
        self.db.executescript("""
            CREATE TABLE IF NOT EXISTS userroles(
                record_id     INTEGER PRIMARY KEY AUTOINCREMENT,
                project_name  TEXT NOT NULL,
                user_name     TEXT NOT NULL,
                role_name     TEXT NOT NULL,
                create_by     TEXT NOT NULL,
                create_reason TEXT NOT NULL,
                create_time   TEXT NOT NULL,
                delete_by     TEXT,
                delete_reason TEXT,
                delete_time   TEXT);
            CREATE INDEX IF NOT EXISTS ur_user ON userroles (user_name);
            CREATE INDEX IF NOT EXISTS ur_project ON userroles (project_name);
            CREATE INDEX IF NOT EXISTS ur_role ON userroles (role_name);
        """)

    def grant(self, project: str, user: str, permission: Permission,
              requestor: str, reason: str) -> None:
        self.db.execute(
            "INSERT INTO userroles (project_name, user_name, role_name,"
            " create_by, create_reason, create_time) VALUES (?,?,?,?,?,?)",
            (project.lower(), user.lower(), permission.role_name,
             requestor, reason, _now()))
        self.db.commit()

    def revoke(self, project: str, user: str, permission: Permission,
               requestor: str, reason: str) -> None:
        """Soft delete (audit rows survive, per the userroles schema)."""
        cur = self.db.execute(
            "UPDATE userroles SET delete_by=?, delete_reason=?, delete_time=?"
            " WHERE project_name=? AND user_name=? AND role_name=?"
            " AND delete_time IS NULL",
            (requestor, reason, _now(), project.lower(), user.lower(),
             permission.role_name))
        self.db.commit()
        if cur.rowcount == 0:
            raise RegistryError(
                f"no active {permission.role_name} grant for {user} "
                f"on {project}")

    def check(self, user: Optional[str], project: str,
              permission: Permission) -> bool:
        """True iff ``user`` holds a role ≥ ``permission`` on ``project``
        or on the global scope. ``user=None`` means RBAC-disabled caller
        (Credential::RbacDisabled) — always allowed."""
        if user is None:
            return True
        rows = self.db.execute(
            "SELECT role_name FROM userroles WHERE user_name=?"
            " AND project_name IN (?,?) AND delete_time IS NULL",
            (user.lower(), project.lower(), GLOBAL_SCOPE)).fetchall()
        return any(Permission.from_role(r[0]) >= permission for r in rows)

    def require(self, user: Optional[str], project: str,
                permission: Permission) -> None:
        if not self.check(user, project, permission):
            raise PermissionDenied(
                f"Credential {user} doesn't have {permission.name} "
                f"permission to resource {project}")

    def user_roles(self) -> List[dict]:
        """All grants (active AND revoked — the audit view the reference's
        GET /userroles returns), camelCase per api_models/rbac.rs."""
        rows = self.db.execute(
            "SELECT project_name, user_name, role_name, create_by,"
            " create_reason, create_time, delete_by, delete_reason,"
            " delete_time FROM userroles ORDER BY record_id").fetchall()
        out = []
        for (scope, user, role, c_by, c_reason, c_time,
             d_by, d_reason, d_time) in rows:
            out.append({
                "scope": scope,
                "userName": user,
                "roleName": role,
                "createBy": c_by,
                "createReason": c_reason,
                "createTime": c_time,
                "deleteBy": d_by,
                "deleteReason": d_reason,
                "deleteTime": d_time,
                "access": Permission.from_role(role).access,
            })
        return out
