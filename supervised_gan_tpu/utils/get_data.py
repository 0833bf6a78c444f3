"""Dataset downloader (reference util/get_data.py:11-115): scrapes the
Berkeley CycleGAN/pix2pix dataset index, presents the options, downloads and
extracts the chosen archive.  Offline tooling — not on the train path.

Uses only the stdlib (html.parser instead of BeautifulSoup).
"""

import os
import tarfile
import zipfile
from html.parser import HTMLParser
from urllib.request import urlopen
from urllib.parse import urljoin


class _LinkParser(HTMLParser):
    def __init__(self):
        super().__init__()
        self.hrefs = []

    def handle_starttag(self, tag, attrs):
        if tag == 'a':
            for k, v in attrs:
                if k == 'href' and v:
                    self.hrefs.append(v)


class GetData:
    """GetData(technique='cyclegan'|'pix2pix').get(save_path) downloads an
    archive chosen interactively and returns the extracted dataset path."""

    def __init__(self, technique='cyclegan', verbose=True):
        url_dict = {
            'pix2pix': 'https://people.eecs.berkeley.edu/~tinghuiz/projects/pix2pix/datasets',
            'cyclegan': 'https://people.eecs.berkeley.edu/~taesung_park/CycleGAN/datasets',
        }
        self.url = url_dict[technique]
        self._verbose = verbose

    def _print(self, text):
        if self._verbose:
            print(text)

    def _get_options(self):
        with urlopen(self.url) as r:
            parser = _LinkParser()
            parser.feed(r.read().decode('utf-8', 'replace'))
        return [h for h in parser.hrefs
                if h.endswith(('.zip', '.tar.gz', '.tgz'))]

    def _present_options(self):
        options = self._get_options()
        print('Options:\n')
        for i, o in enumerate(options):
            print("{0}: {1}".format(i, o))
        choice = input("\nPlease enter the number of the "
                       "dataset above you wish to download: ")
        return options[int(choice)]

    def _download_data(self, dataset_url, save_path):
        os.makedirs(save_path, exist_ok=True)
        base = os.path.basename(dataset_url)
        save_full = os.path.join(save_path, base)
        with urlopen(dataset_url) as r, open(save_full, 'wb') as f:
            f.write(r.read())
        if base.endswith('.tar.gz') or base.endswith('.tgz'):
            with tarfile.open(save_full) as obj:
                obj.extractall(save_path)
        elif base.endswith('.zip'):
            with zipfile.ZipFile(save_full) as obj:
                obj.extractall(save_path)

    def get(self, save_path, dataset=None):
        if dataset is None:
            selected = self._present_options()
        else:
            selected = dataset
        self._print('Downloading Data for [{0}]'.format(selected))
        url = urljoin(self.url + '/', selected)
        self._download_data(url, save_path)
        base = os.path.basename(selected)
        data_dir = os.path.join(
            save_path, base.replace('.zip', '').replace('.tar.gz', '')
            .replace('.tgz', ''))
        return os.path.abspath(data_dir)
