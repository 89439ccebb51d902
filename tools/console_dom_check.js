#!/usr/bin/env node
/**
 * Console DOM integration check — the reference's four puppeteer
 * scenarios (/root/reference/test-console.js: checkIDs,
 * searchSomeResults, searchNoResults, topicsRefresh) executed against a
 * RUNNING graft server, actually running the console page's inline
 * script. No browser ships in this environment (the same constraint
 * that blocks the reference's own puppeteer harness), so the DOM is a
 * minimal hand-rolled shim: just the surface the console script uses —
 * getElementById, createElement, select options, XHR with streaming
 * onprogress, fetch.
 *
 * Usage:  node tools/console_dom_check.js [http://localhost:4411]
 * Exit 0 = all four scenarios pass.
 */
'use strict';
const http = require('http');
const assert = require('assert');

const base = process.argv[2] || 'http://localhost:4411';

function get(path) {
  return new Promise((resolve, reject) => {
    http.get(base + path, res => {
      let body = '';
      res.on('data', d => body += d);
      res.on('end', () => resolve(body));
    }).on('error', reject);
  });
}

// ---- minimal DOM shim -----------------------------------------------
function makeElement(tag) {
  const e = {
    tagName: tag, children: [], style: {}, value: '', checked: false,
    selectedIndex: 0, onclick: null, onchange: null,
    appendChild(c) { this.children.push(c); syncSelect(this); return c; },
    prepend(c) { this.children.unshift(c); return c; },
    removeChild(c) {
      this.children.splice(this.children.indexOf(c), 1); syncSelect(this);
    },
    get childNodes() { return this.children; },
    get options() { return this.children; },
    get length() { return this.children.length; },
    set innerHTML(v) { if (v === '') this.children = []; this._html = v; },
    get innerHTML() { return this._html || ''; },
    set innerText(v) { this._text = String(v); },
    get innerText() { return this._text || ''; },
  };
  return e;
}
// <select>.value mirrors options[selectedIndex].value, like the real DOM;
// numeric index access (sel[i]) is what populateFromUri uses.
function syncSelect(e) {
  if (e.tagName !== 'select') return;
  for (let i = 0; i < e.children.length; i++) e[i] = e.children[i];
  if (e.selectedIndex >= e.children.length) e.selectedIndex = 0;
  Object.defineProperty(e, 'value', {
    configurable: true,
    get() { return this.children[this.selectedIndex] ?
      this.children[this.selectedIndex].value : ''; },
    set(_) {},
  });
}

function buildDom(html) {
  const byId = {};
  // Scrape (tag, id) pairs straight from the served page — the scrape IS
  // the checkIDs inventory source, so a renamed id fails scenario 1.
  for (const m of html.matchAll(/<(\w+)[^>]*\bid="([^"]+)"/g)) {
    byId[m[2]] = makeElement(m[1]);
    if (m[1] === 'select') syncSelect(byId[m[2]]);
  }
  // The form's elements collection (onload wires onchange over it).
  byId['query-form'].elements = Object.values(byId)
    .filter(e => ['input', 'select', 'button'].includes(e.tagName));
  return byId;
}

class ShimXHR {
  open(method, path) { this.path = path; this.responseText = ''; }
  send() {
    http.get(base + this.path, res => {
      res.on('data', d => {
        this.responseText += d;
        if (this.onprogress) this.onprogress();
      });
      res.on('end', () => { if (this.onloadend) this.onloadend(); });
    });
  }
  abort() { if (this.onloadend) this.onloadend(); }
}

async function main() {
  const html = await get('/');
  const script = /<script>([\s\S]*)<\/script>/.exec(html)[1];
  const byId = buildDom(html);

  // Scenario 1: checkIDs — the reference's inventory, verbatim
  // (test-console.js:65-96).
  const inventory = ['key', 'val-regex', 'bootstrap-servers',
    'schema-registry-url', 'topic', 'default-partition', 'relative-offset',
    'follow', 'key-deserializer', 'value-deserializer', 'partitions',
    'help-partition', 'help-key', 'help-value', 'help-offset',
    'help-follow', 'help-partition-csv',
    'loading-partition', 'loading-offset', 'loading-timestamp',
    'loading-num-results', 'dialog-bg', 'dialog-fg', 'dialog-text'];
  for (const id of inventory) assert(byId[id], `missing element #${id}`);
  console.log('checkIDs: ok (' + inventory.length + ' ids)');

  // Run the console script for real.
  const windowShim = {
    location: { search: '', origin: base },
    history: { replaceState(a, b, url) { windowShim._url = url; } },
  };
  const sandbox = {
    window: windowShim,
    document: {
      getElementById: id => byId[id] || null,
      createElement: tag => makeElement(tag),
    },
    XMLHttpRequest: ShimXHR,
    fetch: (p) => fetch(base + p),
    JSON, encodeURI, encodeURIComponent, decodeURIComponent, Object,
    console,
  };
  require('vm').runInNewContext(script, sandbox);
  windowShim.onload();
  // loadServerConfigs is async: wait until the topic select populates.
  await waitFor(() => byId['topic'].length > 0, 'server-configs load');
  assert(byId['bootstrap-servers'].value === '/root/testdata/sf0.001');
  assert(byId['topic'].children.some(o => o.value === 'events'));

  async function runSearch(key) {
    byId['key'].value = key;
    byId['topic'].selectedIndex =
      byId['topic'].children.findIndex(o => o.value === 'events');
    byId['results'].children = [];
    byId['submit'].onclick();
    await waitFor(() => byId['loading'].style.display === 'none',
      `search "${key}"`);
    return byId['results'].children.filter(c => c.tagName === 'pre');
  }

  // Scenario 2: searchSomeResults (test-console.js:99-105).
  const some = await runSearch('1.*');
  assert(some.length > 0, 'expected results for key 1.*');
  const first = JSON.parse(some[0].innerText);
  assert(first.type === 'result' && first.topic === 'events', some[0].innerText);
  assert(byId['loading-num-results'].innerHTML === some.length,
    'result counter tracks rendered results');
  console.log(`searchSomeResults: ok (${some.length} results rendered)`);

  // Scenario 3: searchNoResults (test-console.js:107-113).
  const none = await runSearch('noresults');
  assert(none.length === 0, 'expected empty results for key noresults');
  console.log('searchNoResults: ok');

  // Scenario 4: topicsRefresh (test-console.js:116-145) — empty the
  // topic select, fire bootstrap-servers.onchange, expect repopulation.
  byId['topic'].children = [];
  assert(byId['topic'].length === 0);
  byId['bootstrap-servers'].onchange();
  assert(byId['topic'].length > 0, 'topics repopulated on server change');
  console.log('topicsRefresh: ok');

  // C7 while we're here: the URL reflects the last submitted state.
  assert(windowShim._url && windowShim._url.startsWith('?') &&
    JSON.parse(decodeURIComponent(windowShim._url.slice(1))).key === 'noresults');
  console.log('url-state: ok');
  console.log('--- 4/4 scenarios OK');
}

function waitFor(cond, what, ms = 15000) {
  return new Promise((resolve, reject) => {
    const t0 = Date.now();
    (function poll() {
      if (cond()) return resolve();
      if (Date.now() - t0 > ms) return reject(new Error('timeout: ' + what));
      setTimeout(poll, 50);
    })();
  });
}

main().catch(e => { console.error(e); process.exit(1); });
