"""KITTI IMU prep tool: swap synced 10 Hz oxts for raw 100 Hz oxts.

Rebuild of tools/replace_imu.py:1-41: KITTI *_sync folders ship only 10 Hz
OXTS; iSLAM's preintegration wants the 100 Hz stream from the *_extract
folders.  This renames the sync oxts dir aside and symlinks/copies the raw
one in its place.
"""

import argparse
import os
import shutil


def replace_imu(base_dir: str, dry_run: bool = False):
    n = 0
    for date in sorted(os.listdir(base_dir)):
        date_dir = os.path.join(base_dir, date)
        if not os.path.isdir(date_dir):
            continue
        for drive in sorted(os.listdir(date_dir)):
            if not drive.endswith('_sync'):
                continue
            sync_dir = os.path.join(date_dir, drive)
            extract_dir = os.path.join(date_dir,
                                       drive.replace('_sync', '_extract'))
            raw_oxts = os.path.join(extract_dir, 'oxts')
            sync_oxts = os.path.join(sync_dir, 'oxts')
            backup = os.path.join(sync_dir, 'oxts_10hz')
            if not os.path.isdir(raw_oxts):
                print(f'skip (no extract): {sync_dir}')
                continue
            if os.path.isdir(backup):
                print(f'skip (already replaced): {sync_dir}')
                continue
            print(f'replace {sync_oxts} <- {raw_oxts}')
            if not dry_run:
                shutil.move(sync_oxts, backup)
                shutil.copytree(raw_oxts, sync_oxts)
            n += 1
    print(f'{n} drives processed')


if __name__ == '__main__':
    p = argparse.ArgumentParser()
    p.add_argument('base_dir', help='KITTI base dir containing date folders')
    p.add_argument('--dry-run', action='store_true')
    a = p.parse_args()
    replace_imu(a.base_dir, a.dry_run)
