"""Storage-backend facade (reference: basicsr/utils/file_client.py):
disk and lmdb backends behind a uniform bytes-get interface. memcached is
gated (client libs not in this image)."""
from __future__ import annotations

from abc import ABCMeta, abstractmethod


class BaseStorageBackend(metaclass=ABCMeta):
    @abstractmethod
    def get(self, filepath):
        pass


class DiskBackend(BaseStorageBackend):
    """(file_client.py:58-70)"""

    def get(self, filepath) -> bytes:
        with open(str(filepath), 'rb') as f:
            return f.read()


class LmdbBackend(BaseStorageBackend):
    """One or many lmdb environments keyed by client_key
    (file_client.py:74-129)."""

    def __init__(self, db_paths, client_keys='default', readonly=True,
                 lock=False, readahead=False, **kwargs):
        try:
            import lmdb
        except ImportError:
            raise ImportError(
                'lmdb backend requires the lmdb package, which is not '
                'available in this image — use the disk backend')
        if isinstance(client_keys, str):
            client_keys = [client_keys]
        if isinstance(db_paths, list):
            self.db_paths = [str(v) for v in db_paths]
        else:
            self.db_paths = [str(db_paths)]
        assert len(client_keys) == len(self.db_paths)
        self._client = {}
        for client, path in zip(client_keys, self.db_paths):
            self._client[client] = lmdb.open(path, readonly=readonly,
                                             lock=lock,
                                             readahead=readahead, **kwargs)

    def get(self, filepath, client_key='default') -> bytes:
        client = self._client[client_key]
        with client.begin(write=False) as txn:
            return txn.get(str(filepath).encode('ascii'))


class MemcachedBackend(BaseStorageBackend):
    """Memcached backend (file_client.py:22-55): same config surface as
    the reference; the `mc` client library gates at import, exactly like
    the reference's behavior when memcached isn't installed."""

    def __init__(self, server_list_cfg, client_cfg, sys_path=None):
        if sys_path is not None:
            import sys
            sys.path.append(sys_path)
        try:
            import mc
        except ImportError:
            raise ImportError(
                'Please install memcached to enable MemcachedBackend.')
        self.server_list_cfg = server_list_cfg
        self.client_cfg = client_cfg
        self._client = mc.MemcachedClient.GetInstance(
            self.server_list_cfg, self.client_cfg)
        self._mc_buffer = mc.pyvector()

    def get(self, filepath) -> bytes:
        import mc
        self._client.Get(str(filepath), self._mc_buffer)
        return mc.ConvertBuffer(self._mc_buffer)


class FileClient:
    """Facade dispatching on backend name (file_client.py:132-167)."""
    _backends = {'disk': DiskBackend, 'lmdb': LmdbBackend,
                 'memcached': MemcachedBackend}

    def __init__(self, backend: str = 'disk', **kwargs):
        if backend not in self._backends:
            raise ValueError(
                f'Backend {backend} is not supported. Currently supported '
                f'ones are {list(self._backends)}')
        self.backend = backend
        self.client = self._backends[backend](**kwargs)

    def get(self, filepath, client_key='default') -> bytes:
        if self.backend == 'lmdb':
            return self.client.get(filepath, client_key)
        return self.client.get(filepath)
