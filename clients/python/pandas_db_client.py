"""Drop-in Python client for the graft Store HTTP facade.

Mirrors the reference SDK's ``DataFrameClient`` (same three methods, same
payload shapes, same ``{'error': ...}`` unwrapping) using ONLY the Python
standard library, so it runs anywhere. If pandas is installed, frames go
in and come out as ``pd.DataFrame``; otherwise plain lists of dicts work
on both sides — the wire format is identical either way
(records-orient JSON).

Point it at a running ``graft.server.Serve`` process::

    client = DataFrameClient('http://127.0.0.1:8765', auth_token='ignored')
    client.load_dataframe(df, 'my-test/test1',
                          columns_keys={'date': 'Date'}, external_key='v1')
    back = client.get_dataframe('my-test/test1', use_last=True)
    listing = client.list_dataframes(prefix='my-test')
"""

import json
import urllib.error
import urllib.parse
import urllib.request

try:
    import pandas as _pd
except ImportError:  # stdlib-only mode: rows are lists of dicts
    _pd = None


class DataFrameClient:
    """Client for the DataFrame storage facade (reference-API-compatible)."""

    def __init__(self, api_url, auth_token='', region='us-east-1'):
        self.api_url = api_url.rstrip('/')
        self.headers = {
            'Authorization': f'Bearer {auth_token}',
            'Content-Type': 'application/json',
        }
        self.region = region  # accepted for signature parity; unused

    def _request(self, method, path, params=None, payload=None, action=''):
        url = f'{self.api_url}{path}'
        if params:
            url += '?' + urllib.parse.urlencode(params)
        data = json.dumps(payload).encode() if payload is not None else None
        req = urllib.request.Request(url, data=data, headers=self.headers,
                                     method=method)
        try:
            with urllib.request.urlopen(req) as resp:
                return json.loads(resp.read().decode())
        except urllib.error.HTTPError as e:
            try:
                error = json.loads(e.read().decode()).get('error', str(e))
            except Exception:
                error = str(e)
            raise Exception(f'Error {action}: {error}') from None

    def load_dataframe(self, df, dataframe_name, columns_keys=None,
                       external_key='NOW', keep_last=False):
        """Store a DataFrame (pandas) or list-of-dicts under ``dataframe_name``."""
        if _pd is not None and isinstance(df, _pd.DataFrame):
            records = df.to_json(orient='records')
        elif isinstance(df, list):
            records = json.dumps(df)
        else:
            raise ValueError('df must be a pandas DataFrame or a list of dicts')
        if not dataframe_name:
            raise ValueError('dataframe_name is required')
        if columns_keys:
            for col, key_type in columns_keys.items():
                if key_type not in ('Date', 'ID'):
                    raise ValueError(f'Invalid key type for {col}: {key_type}')
        payload = {
            'dataframe': records,
            'dataframe_name': dataframe_name,
            'columns_keys': columns_keys,
            'external_key': external_key,
            'keep_last': keep_last,
        }
        return self._request('POST', '/dataframes/upload', payload=payload,
                             action='uploading DataFrame')

    def get_dataframe(self, dataframe_name, external_key=None, use_last=False):
        """Retrieve rows; returns ``pd.DataFrame`` when pandas is available."""
        params = {}
        if external_key:
            params['external_key'] = external_key
        if use_last:
            params['use_last'] = 'true'
        path = urllib.parse.quote(dataframe_name, safe='/')
        rows = self._request('GET', f'/dataframes/{path}',
                             params=params, action='retrieving DataFrame')
        return _pd.DataFrame(rows) if _pd is not None else rows

    def list_dataframes(self, prefix=None):
        """List stored DataFrames, optionally filtered by name prefix."""
        params = {'prefix': prefix} if prefix else None
        return self._request('GET', '/dataframes', params=params,
                             action='listing DataFrames')
